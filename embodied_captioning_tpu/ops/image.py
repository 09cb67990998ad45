"""Image ops on device: bilinear resize, normalization, patchify, ROI crops.

These replace the reference's host-side cv2/PIL/albumentations preprocessing
and detectron2's ROIAlign CUDA op (ref: utils/predictor_utils.py:308-379 runs
the HF Mask2Former processor on CPU; detector/pseudolabeler.py:653-672 crops
boxes with PIL before captioning). Here everything is jnp with static shapes
so XLA fuses resize+normalize+patchify into the encoder's first matmul. A
Pallas fused variant lives in ops/pallas/preprocess.py.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

# CLIP-style normalization constants (the captioner's preprocessing family).
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def _gather_axis(img: jnp.ndarray, idx0: jnp.ndarray, idx1: jnp.ndarray,
                 frac: jnp.ndarray, axis: int) -> jnp.ndarray:
    lo = jnp.take(img, idx0, axis=axis)
    hi = jnp.take(img, idx1, axis=axis)
    shape = [1] * img.ndim
    shape[axis] = -1
    f = frac.reshape(shape)
    return lo * (1.0 - f) + hi * f


def resize_bilinear(img: jnp.ndarray, out_h: int, out_w: int,
                    align_corners: bool = False) -> jnp.ndarray:
    """Bilinear resize of [..., H, W, C] (or [H, W]) images, half-pixel
    centers (cv2.INTER_LINEAR / torch align_corners=False parity)."""
    squeeze = False
    if img.ndim == 2:
        img = img[..., None]
        squeeze = True
    h, w = img.shape[-3], img.shape[-2]
    img = img.astype(jnp.float32)

    def src_coords(out_n: int, in_n: int):
        if align_corners and out_n > 1:
            scale = (in_n - 1.0) / (out_n - 1.0)
            src = jnp.arange(out_n, dtype=jnp.float32) * scale
        else:
            scale = in_n / out_n
            src = (jnp.arange(out_n, dtype=jnp.float32) + 0.5) * scale - 0.5
        src = jnp.clip(src, 0.0, in_n - 1.0)
        i0 = jnp.floor(src).astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, in_n - 1)
        return i0, i1, src - i0.astype(jnp.float32)

    y0, y1, fy = src_coords(out_h, h)
    x0, x1, fx = src_coords(out_w, w)
    img = _gather_axis(img, y0, y1, fy, axis=img.ndim - 3)
    img = _gather_axis(img, x0, x1, fx, axis=img.ndim - 2)
    return img[..., 0] if squeeze else img


def normalize(img: jnp.ndarray, mean: Sequence[float] = CLIP_MEAN,
              std: Sequence[float] = CLIP_STD) -> jnp.ndarray:
    """Normalize [..., H, W, 3] float images in [0, 1]."""
    mean_a = jnp.asarray(mean, jnp.float32)
    std_a = jnp.asarray(std, jnp.float32)
    return (img.astype(jnp.float32) - mean_a) / std_a


def to_float(img_u8: jnp.ndarray) -> jnp.ndarray:
    return img_u8.astype(jnp.float32) / 255.0


def patchify(img: jnp.ndarray, patch: int) -> jnp.ndarray:
    """[..., H, W, C] -> [..., H/p * W/p, p*p*C] patch tokens.

    Laid out so the ViT's patch-embedding matmul is a single [T, p*p*C] @
    [p*p*C, width] contraction on the MXU."""
    *lead, h, w, c = img.shape
    gh, gw = h // patch, w // patch
    x = img.reshape(*lead, gh, patch, gw, patch, c)
    x = jnp.moveaxis(x, -4, -3)  # [..., gh, gw, p, p, c]
    return x.reshape(*lead, gh * gw, patch * patch * c)


def preprocess_for_vit(img_u8: jnp.ndarray, image_size: int, patch: int,
                       ) -> jnp.ndarray:
    """uint8 [..., H, W, 3] -> patch tokens for the ViT. XLA fuses the whole
    chain; on TPU the resize gathers and the normalize are bandwidth-bound and
    ride the VPU."""
    x = to_float(img_u8)
    x = resize_bilinear(x, image_size, image_size)
    x = normalize(x)
    return patchify(x, patch)


def crop_and_resize(img: jnp.ndarray, boxes: jnp.ndarray, out_size: int,
                    ) -> jnp.ndarray:
    """ROI crop + bilinear resize of XYXY pixel boxes — the captioner's crop
    path and the detector's ROIAlign replacement.

    Args:
      img:   [H, W, C] float image.
      boxes: [N, 4] XYXY pixel boxes (degenerate boxes produce zeros-crops).
      out_size: output side (square).

    Returns [N, out_size, out_size, C]. Implemented as two batched gathers
    with bilinear weights — XLA lowers these to efficient dynamic-slices;
    the Pallas variant (ops/pallas/roi_align.py) tiles it explicitly.
    """
    h, w, c = img.shape
    n = boxes.shape[0]
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    bw = jnp.maximum(x2 - x1, 1e-3)
    bh = jnp.maximum(y2 - y1, 1e-3)
    # ROIAlign-style: sample at pixel centers of a regular out_size grid
    u = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) / out_size
    sx = x1[:, None] + u[None, :] * bw[:, None]  # [N, S]
    sy = y1[:, None] + u[None, :] * bh[:, None]  # [N, S]
    sx = jnp.clip(sx - 0.5, 0.0, w - 1.0)
    sy = jnp.clip(sy - 0.5, 0.0, h - 1.0)
    x0 = jnp.floor(sx).astype(jnp.int32)
    x1i = jnp.minimum(x0 + 1, w - 1)
    fx = sx - x0
    y0 = jnp.floor(sy).astype(jnp.int32)
    y1i = jnp.minimum(y0 + 1, h - 1)
    fy = sy - y0

    rows0 = img[y0]          # [N, S, W, C] gather rows
    rows1 = img[y1i]
    rows = rows0 * (1.0 - fy)[..., None, None] + rows1 * fy[..., None, None]
    # gather cols per-roi: rows is [N, S, W, C]; take along axis 2
    idx0 = x0[:, None, :, None]
    idx1 = x1i[:, None, :, None]
    cols0 = jnp.take_along_axis(rows, jnp.broadcast_to(idx0, (n, out_size, out_size, c)), axis=2)
    cols1 = jnp.take_along_axis(rows, jnp.broadcast_to(idx1, (n, out_size, out_size, c)), axis=2)
    out = cols0 * (1.0 - fx)[:, None, :, None] + cols1 * fx[:, None, :, None]
    return out


def roi_align(feat: jnp.ndarray, boxes: jnp.ndarray, out_size: int,
              spatial_scale: float = 1.0, sampling_ratio: int = 2
              ) -> jnp.ndarray:
    """ROIAlign over a feature map [H, W, C] with `sampling_ratio`^2 bilinear
    samples per bin, avg-pooled (torchvision ROIAlign semantics — the
    detectron2 CUDA op the reference's box pooler uses,
    ref: detector/model/multi_stage_models.py:254-330)."""
    s = out_size * sampling_ratio
    fine = crop_and_resize(feat, boxes * spatial_scale, s)
    n, _, _, c = fine.shape
    fine = fine.reshape(n, out_size, sampling_ratio, out_size, sampling_ratio, c)
    return fine.mean(axis=(2, 4))


def paste_masks(mask_logits: jnp.ndarray, boxes: jnp.ndarray, height: int,
                width: int) -> jnp.ndarray:
    """Paste [N, m, m] ROI mask logits into full-frame [N, H, W] probability
    maps (detectron2 paste_masks_in_image semantics). Vectorized: for each
    output pixel compute its coordinate inside the box and bilinearly sample
    the ROI mask."""
    n, m, _ = mask_logits.shape
    ys = jnp.arange(height, dtype=jnp.float32)[None, :, None]  # [1, H, 1]
    xs = jnp.arange(width, dtype=jnp.float32)[None, None, :]   # [1, 1, W]
    x1 = boxes[:, 0][:, None, None]
    y1 = boxes[:, 1][:, None, None]
    bw = jnp.maximum(boxes[:, 2][:, None, None] - x1, 1e-3)
    bh = jnp.maximum(boxes[:, 3][:, None, None] - y1, 1e-3)
    u = (xs - x1) / bw * m - 0.5  # ROI-mask coords
    v = (ys - y1) / bh * m - 0.5
    inside = (u > -0.5) & (u < m - 0.5) & (v > -0.5) & (v < m - 0.5)
    u = jnp.clip(u, 0.0, m - 1.0)
    v = jnp.clip(v, 0.0, m - 1.0)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    u1 = jnp.minimum(u0 + 1, m - 1)
    v1 = jnp.minimum(v0 + 1, m - 1)
    fu = u - u0
    fv = v - v0
    flat = mask_logits.reshape(n, m * m)
    bidx = jnp.arange(n)[:, None, None]

    def g(vv, uu):
        return flat[bidx, vv * m + uu]

    val = (g(v0, u0) * (1 - fu) * (1 - fv) + g(v0, u1) * fu * (1 - fv)
           + g(v1, u0) * (1 - fu) * fv + g(v1, u1) * fu * fv)
    probs = jax.nn.sigmoid(val)
    return jnp.where(inside, probs, 0.0)
