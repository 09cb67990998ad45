"""On-device batched detection augmentation (TPU-resident training data).

The reference augments on the host inside torch Datasets
(ref: experimenting_env/detector/dataset.py augmentation stacks, applied
per-sample in DataLoader workers). On this rig the host has ONE core, so a
numpy augmentation loop serializes the whole detector train step (~0.2 s/step
measured for a width-48/128² model whose device work is milliseconds). Here
augmentation is a pure jitted batch transform: the training corpus lives in
HBM once, every step gathers a batch and augments it on device, and the
host never touches pixels again.

Augmentations match `labeling/datasets.apply_augmentation` semantics:
  * random horizontal flip (image, masks, boxes — exact),
  * random-resized-crop "zoom in" (nearest resample, exact box transform,
    sliver dropping) — scale jitter so unseen-scene objects at novel
    apparent sizes stay in-distribution,
  * brightness/color jitter.

Nearest resampling is expressed as per-sample one-hot row/col matmuls
(the renderer's one-hot MXU trick, `envs/sim.py`): no elementwise gathers
on the hot path, and crop+flip fuse into ONE pair of einsums for the image
and one for the masks.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .detections import Detections


class AugmentParams(NamedTuple):
    """Per-sample draws, separated from application so tests can pin them.

    do_crop  [B] bool      apply random-resized-crop
    scale    [B] f32       crop scale in (0, 1]; window = floor(dim * scale)
    oy, ox   [B] f32       uniform in [0, 1): window offset fractions
    do_flip  [B] bool      horizontal flip
    bright   [B] f32       multiplicative brightness
    shift    [B, 3] f32    additive per-channel color shift
    """

    do_crop: jnp.ndarray
    scale: jnp.ndarray
    oy: jnp.ndarray
    ox: jnp.ndarray
    do_flip: jnp.ndarray
    bright: jnp.ndarray
    shift: jnp.ndarray


def draw_augment_params(key: jax.Array, batch: int, *, crop: bool = True,
                        crop_prob: float = 0.5,
                        crop_range: Tuple[float, float] = (0.55, 0.95),
                        flip: bool = True, jitter: bool = True,
                        bright_range: Tuple[float, float] = (0.75, 1.25),
                        shift_amp: float = 15.0) -> AugmentParams:
    kc, ks, ky, kx, kf, kb, kh = jax.random.split(key, 7)
    one = jnp.ones((batch,), jnp.float32)
    return AugmentParams(
        do_crop=(jax.random.uniform(kc, (batch,)) < crop_prob) if crop
        else jnp.zeros((batch,), bool),
        scale=jax.random.uniform(ks, (batch,), minval=crop_range[0],
                                 maxval=crop_range[1]) if crop else one,
        oy=jax.random.uniform(ky, (batch,)),
        ox=jax.random.uniform(kx, (batch,)),
        do_flip=(jax.random.uniform(kf, (batch,)) < 0.5) if flip
        else jnp.zeros((batch,), bool),
        bright=jax.random.uniform(kb, (batch,), minval=bright_range[0],
                                  maxval=bright_range[1]) if jitter else one,
        shift=jax.random.uniform(kh, (batch, 3), minval=-shift_amp,
                                 maxval=shift_amp) if jitter
        else jnp.zeros((batch, 3), jnp.float32),
    )


def _axis_onehots(n: int, win: jnp.ndarray, off: jnp.ndarray,
                  flip: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Per-sample nearest-resample one-hot matrices [B, n, n].

    Output row i reads source index off + (i * win) // n (the zoom-in crop
    resampled back to n, matching the host `yi = oy + (arange(n)*ch)//n`
    indexing); with `flip`, output i reads what non-flipped n-1-i would.
    """
    i = jnp.arange(n)
    src = off[:, None] + (i[None, :] * win[:, None]) // n      # [B, n]
    if flip is not None:
        src = jnp.where(flip[:, None], src[:, ::-1], src)
    return (src[:, :, None] == i[None, None, :]).astype(jnp.float32)


def apply_augment(rgb: jnp.ndarray, det: Detections, p: AugmentParams,
                  *, min_box: float = 4.0
                  ) -> Tuple[jnp.ndarray, Detections]:
    """Apply `p` to a batch: rgb [B, H, W, 3] uint8, batched Detections with
    boxes [B, N, 4] XYXY pixels, masks [B, N, H, W] (uint8/float/bool).

    Returns (uint8 rgb, Detections with transformed boxes/masks and slivers
    dropped from `valid`). Pure and jittable; fixed shapes throughout.
    """
    b, h, w = rgb.shape[0], rgb.shape[1], rgb.shape[2]
    # crop window (identity when not cropping)
    ch = jnp.where(p.do_crop,
                   jnp.maximum((h * p.scale).astype(jnp.int32), 8), h)
    cw = jnp.where(p.do_crop,
                   jnp.maximum((w * p.scale).astype(jnp.int32), 8), w)
    oy = jnp.where(p.do_crop, (p.oy * (h - ch + 1).astype(jnp.float32))
                   .astype(jnp.int32), 0)
    ox = jnp.where(p.do_crop, (p.ox * (w - cw + 1).astype(jnp.float32))
                   .astype(jnp.int32), 0)

    wy = _axis_onehots(h, ch, oy, None)                 # [B, H, H]
    wx = _axis_onehots(w, cw, ox, p.do_flip)            # [B, W, W]

    # image + masks: crop/resize/flip in one einsum pair each (MXU)
    img = jnp.einsum("bih,bhwc->biwc", wy, rgb.astype(jnp.float32))
    img = jnp.einsum("bjw,biwc->bijc", wx, img)
    out_masks = None
    if det.masks is not None:
        m = jnp.einsum("bih,bnhw->bniw", wy, det.masks.astype(jnp.float32))
        m = jnp.einsum("bjw,bniw->bnij", wx, m)
        out_masks = (m >= 0.5).astype(det.masks.dtype)

    # boxes: crop scale+clip, then flip
    sx = (w / cw.astype(jnp.float32))[:, None]
    sy = (h / ch.astype(jnp.float32))[:, None]
    bx = det.boxes.astype(jnp.float32)
    x1 = jnp.clip((bx[..., 0] - ox[:, None].astype(jnp.float32)) * sx, 0, w)
    y1 = jnp.clip((bx[..., 1] - oy[:, None].astype(jnp.float32)) * sy, 0, h)
    x2 = jnp.clip((bx[..., 2] - ox[:, None].astype(jnp.float32)) * sx, 0, w)
    y2 = jnp.clip((bx[..., 3] - oy[:, None].astype(jnp.float32)) * sy, 0, h)
    keep = (x2 - x1 >= min_box) & (y2 - y1 >= min_box) & det.valid
    fx1 = jnp.where(p.do_flip[:, None], w - x2, x1)
    fx2 = jnp.where(p.do_flip[:, None], w - x1, x2)
    boxes = jnp.stack([fx1, y1, fx2, y2], axis=-1)

    # brightness/color jitter
    img = jnp.clip(img * p.bright[:, None, None, None]
                   + p.shift[:, None, None, :], 0, 255).astype(jnp.uint8)
    return img, det.replace(boxes=boxes, masks=out_masks, valid=keep)


def augment_batch(key: jax.Array, rgb: jnp.ndarray, det: Detections, *,
                  crop: bool = True, flip: bool = True, jitter: bool = True,
                  min_box: float = 4.0) -> Tuple[jnp.ndarray, Detections]:
    """Draw + apply in one call (the training-loop entry point)."""
    p = draw_augment_params(key, rgb.shape[0], crop=crop, flip=flip,
                            jitter=jitter)
    return apply_augment(rgb, det, p, min_box=min_box)
