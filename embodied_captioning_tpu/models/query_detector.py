"""Mask2Former-class query detector (set prediction, TPU-first).

The reference's runtime detector is HF Mask2Former-Swin-Large
(ref: experimenting_env/utils/predictor_utils.py:210-240,
confs/habitat/gibson_goal_exploration.yaml:96-116): learned object queries
cross-attend to pixel features through a masked-attention transformer
decoder, and each query emits one (class, mask) pair — no anchors, no NMS.
That formulation is *naturally* TPU-shaped: the query count is a static Q,
so set prediction needs none of the padded-NMS machinery the R-CNN family
does. This module implements the same architecture family over this repo's
backbone/FPN (the pixel decoder) with:

  * learned queries + per-scale level embeddings, 2D sinusoidal positions,
  * `query_layers` decoder layers cycling coarse->fine over the 3 coarsest
    FPN scales, each layer = masked cross-attention (the attention mask is
    the previous layer's own mask prediction — Mask2Former's signature
    mechanism) -> query self-attention -> MLP (pre-LN),
  * per-layer class + mask-embedding heads (deep supervision),
  * Hungarian-matched set loss (CE + mask BCE + dice), via
    `optax.assignment.hungarian_algorithm` — jittable, vmapped per image,
  * inference: top-k queries by class-prob x mask-confidence, boxes from
    mask extents, ROI mask crops — returning the same padded `Detections`
    contract as the R-CNN head (drop-in for perception/mapping/labeling).

Select with ``DetectorConfig(family="query")``; `detector.init_detector`,
`detector.forward` and `detector.detector_loss` dispatch here.

Mask/BCE/dice cost matrices are pure matmuls over flattened pixels (MXU);
everything is fixed-shape; the no-object class is index `num_classes`.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
from optax import assignment

from ..config import DetectorConfig
from ..ops.detections import Detections
from ..ops.image import resize_bilinear, roi_align
from .common import (
    dense, dense_init, layernorm, layernorm_init, mha, mha_init, mlp,
    mlp_init, sinusoidal_positions,
)

Params = Dict[str, Any]

_BACKBONE_KEYS = ("stem", "stem_gn", "stages", "fpn_lat", "fpn_out")
_HEADS = 8
# Mask2Former loss weights (ref: HF Mask2FormerConfig defaults
# class_weight=2, mask_weight=5, dice_weight=5, no_object at 0.1)
_W_CLS, _W_BCE, _W_DICE = 2.0, 5.0, 5.0


def init_query_detector(key, cfg: DetectorConfig) -> Params:
    from . import detector as DET

    if cfg.num_queries < cfg.max_detections:
        raise ValueError("num_queries must be >= max_detections")
    if not 0 <= cfg.query_aux_topk <= cfg.num_queries:
        raise ValueError("query_aux_topk must be in [0, num_queries]")
    if cfg.fpn_dim % _HEADS:
        raise ValueError(f"fpn_dim must be divisible by {_HEADS} heads")
    kb, kq = jax.random.split(key)
    base = DET.init_rcnn_detector(kb, cfg)
    params: Params = {k: base[k] for k in _BACKBONE_KEYS}
    d = cfg.fpn_dim
    ks = iter(jax.random.split(kq, 16 + 8 * cfg.query_layers))
    # pixel-decoder output: mask features from the finest FPN level
    params["mask_conv"] = DET.conv_init(next(ks), 3, d, d)
    params["mask_gn"] = DET.gn_init(d)
    params["mask_proj"] = DET.conv_init(next(ks), 1, d, d)
    params["query_embed"] = (jax.random.normal(next(ks), (cfg.num_queries, d),
                                               jnp.float32) * 0.02)
    params["level_embed"] = (jax.random.normal(next(ks), (3, d), jnp.float32)
                             * 0.02)
    params["layers"] = [{
        "xattn": mha_init(next(ks), d, _HEADS),
        "ln_x": layernorm_init(d),
        "sattn": mha_init(next(ks), d, _HEADS),
        "ln_s": layernorm_init(d),
        "mlp": mlp_init(next(ks), d, 4 * d),
        "ln_m": layernorm_init(d),
    } for _ in range(cfg.query_layers)]
    params["ln_out"] = layernorm_init(d)
    params["cls"] = dense_init(next(ks), d, cfg.num_classes + 1, scale=0.01)
    params["mask_fc1"] = dense_init(next(ks), d, d)
    params["mask_fc2"] = dense_init(next(ks), d, d)
    return params


def _pos2d(h: int, w: int, d: int) -> jnp.ndarray:
    """2D sinusoidal positions [h*w, d] (y-half + x-half)."""
    py = sinusoidal_positions(h, d // 2)
    px = sinusoidal_positions(w, d - d // 2)
    return jnp.concatenate([
        jnp.broadcast_to(py[:, None, :], (h, w, d // 2)),
        jnp.broadcast_to(px[None, :, :], (h, w, d - d // 2))],
        axis=-1).reshape(h * w, d)


def _predict(params: Params, q: jnp.ndarray, mask_feat: jnp.ndarray
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-layer heads: queries [B, Q, d] + mask features [B, Hm, Wm, d]
    -> (class logits [B, Q, C+1] f32, mask logits [B, Q, Hm, Wm] f32)."""
    x = layernorm(params["ln_out"], q)
    cls = dense(params["cls"], x).astype(jnp.float32)
    e = dense(params["mask_fc2"], jax.nn.relu(dense(params["mask_fc1"], x)))
    masks = jnp.einsum("bqd,bhwd->bqhw", e.astype(jnp.float32),
                       mask_feat.astype(jnp.float32),
                       preferred_element_type=jnp.float32)
    return cls, masks


def _attn_mask(mask_logits: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Masked attention [B, 1, Q, h*w] from the previous layer's mask
    prediction: attend where sigmoid > 0.5 (logit > 0) at this scale; a
    query whose predicted mask is empty falls back to full attention
    (Mask2Former's degenerate-mask guard)."""
    b, qn = mask_logits.shape[:2]
    m = jnp.transpose(mask_logits, (0, 2, 3, 1))          # [B, Hm, Wm, Q]
    m = resize_bilinear(m, h, w)
    att = jnp.transpose(m, (0, 3, 1, 2)).reshape(b, qn, h * w) > 0.0
    any_px = jnp.any(att, axis=-1, keepdims=True)
    return jnp.where(any_px, att, True)[:, None]


def _decode(params: Params, images: jnp.ndarray, cfg: DetectorConfig
            ) -> List[Tuple[jnp.ndarray, jnp.ndarray]]:
    """float images [B, S, S, 3] (0..1) -> per-supervision-point
    (class logits, mask logits), layer 0 = pre-decoder queries."""
    from . import detector as DET

    fpn = DET.backbone_fpn(params, images, cfg)
    b, d = images.shape[0], cfg.fpn_dim
    mf = jax.nn.relu(DET.groupnorm(params["mask_gn"],
                                   DET.conv(params["mask_conv"], fpn[0])))
    mask_feat = DET.conv(params["mask_proj"], mf)          # [B, Hm, Wm, d]
    scales = fpn[::-1][:3]                                 # coarsest first
    tokens = []
    for i, f in enumerate(scales):
        h, w = f.shape[1], f.shape[2]
        t = (f.reshape(b, h * w, d).astype(jnp.float32)
             + _pos2d(h, w, d) + params["level_embed"][i])
        tokens.append((t.astype(f.dtype), h, w))
    q = jnp.broadcast_to(params["query_embed"][None],
                         (b, cfg.num_queries, d))
    preds = [_predict(params, q, mask_feat)]
    for li, layer in enumerate(params["layers"]):
        t, h, w = tokens[li % len(tokens)]
        att = _attn_mask(preds[-1][1], h, w)
        hx, _ = mha(layer["xattn"], layernorm(layer["ln_x"], q), _HEADS,
                    kv=t, mask=att)
        q = q + hx
        hs, _ = mha(layer["sattn"], layernorm(layer["ln_s"], q), _HEADS)
        q = q + hs
        q = q + mlp(layer["mlp"], layernorm(layer["ln_m"], q))
        preds.append(_predict(params, q, mask_feat))
    return preds


# ---------------------------------------------------------------------------
# set loss (Hungarian matching)
# ---------------------------------------------------------------------------


def _set_loss_one(cls: jnp.ndarray, mlog: jnp.ndarray, gt_cls: jnp.ndarray,
                  gt_valid: jnp.ndarray, gm: jnp.ndarray, no_obj_w: float,
                  num_classes: int, aux_topk: int = 0
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One image: cls [Q, C+1], mlog [Q, Hm, Wm], gt_cls [G], gt_valid [G],
    gm [G, Hm, Wm] in {0,1}. Returns (loss, matched-query indices [G]).

    ``aux_topk=0``: one-to-one Hungarian matching (the final layer — the
    set-prediction contract; inference has no NMS, so duplicates must be
    trained away). ``aux_topk=k>0``: one-to-MANY matching — each GT
    supervises its k lowest-cost queries (Group/Hybrid-DETR-style dense
    auxiliary supervision). Hungarian assignments churn between steps
    early in training (the matched query flips whenever costs cross),
    which is the dominant seed-to-seed variance source at small corpus
    scale; the one-to-many auxiliary targets keep k queries per object
    pulled toward it regardless of which one currently wins, so it is
    used for the aux (non-final) decoder layers via
    ``DetectorConfig.query_aux_topk``."""
    qn, gn = cls.shape[0], gt_cls.shape[0]
    p = jax.nn.sigmoid(mlog.reshape(qn, -1))               # [Q, P]
    g = gm.reshape(gn, -1)                                 # [G, P]
    npix = p.shape[1]
    eps = 1e-6
    logp, log1p = jnp.log(p + eps), jnp.log(1.0 - p + eps)
    cost_bce = -(logp @ g.T + log1p @ (1.0 - g).T) / npix  # [Q, G]
    inter = p @ g.T
    cost_dice = 1.0 - (2.0 * inter + 1.0) / (
        p.sum(-1)[:, None] + g.sum(-1)[None, :] + 1.0)
    probs = jax.nn.softmax(cls, axis=-1)
    cost_cls = -probs[:, gt_cls].reshape(qn, -1)           # [Q, G]
    cost = _W_CLS * cost_cls + _W_BCE * cost_bce + _W_DICE * cost_dice
    cost = jnp.where(gt_valid[None, :], cost, 1e4)
    gidx = jnp.arange(gn)
    vmask = gt_valid.astype(jnp.float32)
    if aux_topk == 0:
        rows, cols = assignment.hungarian_algorithm(cost)  # len G (Q >= G)
        matched_q = rows[jnp.argsort(cols)]                # query for gt g
        w_assign = jnp.zeros((qn, gn), jnp.float32
                             ).at[matched_q, gidx].set(vmask)
    else:
        # k lowest-cost queries per GT (selection only — no gradient)
        _, topq = jax.lax.top_k(-jax.lax.stop_gradient(cost).T, aux_topk)
        matched_q = topq[:, 0]
        w_assign = jnp.zeros((qn, gn), jnp.float32
                             ).at[topq, gidx[:, None]].add(1.0)
        w_assign = w_assign * vmask[None, :]

    # classification: assigned (query, gt) pairs get the GT class with
    # weight 1 each; unassigned queries no-object (down-weighted)
    logprobs = jax.nn.log_softmax(cls, axis=-1)
    unassigned = (w_assign.sum(-1) == 0).astype(jnp.float32)  # [Q]
    ce_pos = -(w_assign * logprobs[:, gt_cls]).sum()
    ce_neg = -(logprobs[:, num_classes] * unassigned).sum() * no_obj_w
    wsum = w_assign.sum() + no_obj_w * unassigned.sum()
    ce = (ce_pos + ce_neg) / jnp.maximum(wsum, 1.0)

    # mask BCE + dice on assigned pairs (the cost matrices ARE the
    # per-pair mean losses — reuse them)
    npairs = jnp.maximum(w_assign.sum(), 1.0)
    mask_loss = (w_assign * (_W_BCE * cost_bce
                             + _W_DICE * cost_dice)).sum() / npairs
    return _W_CLS * ce + mask_loss, matched_q


def query_detector_loss(params: Params, images_u8: jnp.ndarray,
                        gt: Detections, cfg: DetectorConfig,
                        head: str = "ce", **_unused
                        ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Hungarian-matched set loss with deep supervision over every decoder
    layer (Mask2Former trains all aux heads; ref HF
    Mask2FormerForUniversalSegmentation loss). `head` families other than
    plain CE belong to the R-CNN ROI head and are rejected here."""
    if head != "ce":
        raise ValueError(f"query family supports head='ce' only, got {head}")
    if gt.masks is None:
        raise ValueError("query family trains mask-supervised; gt.masks "
                         "required")
    images = images_u8.astype(jnp.float32) / 255.0
    preds = _decode(params, images, cfg)
    hm, wm = preds[0][1].shape[2], preds[0][1].shape[3]
    gmask = jnp.transpose(gt.masks.astype(jnp.float32), (0, 2, 3, 1))
    gmask = (resize_bilinear(gmask, hm, wm) >= 0.5).astype(jnp.float32)
    gmask = jnp.transpose(gmask, (0, 3, 1, 2))             # [B, G, Hm, Wm]

    total = 0.0
    for li, (cls, mlog) in enumerate(preds):
        # final layer: one-to-one Hungarian (the inference contract);
        # aux layers: optional one-to-many top-k (query_aux_topk > 0)
        k = cfg.query_aux_topk if li < len(preds) - 1 else 0
        losses, _ = jax.vmap(functools.partial(
            _set_loss_one, no_obj_w=cfg.no_object_weight,
            num_classes=cfg.num_classes,
            aux_topk=k))(cls, mlog, gt.classes, gt.valid, gmask)
        total = total + losses.mean()
    total = total / len(preds)
    return total, {"total": total, "layers": jnp.asarray(len(preds))}


# ---------------------------------------------------------------------------
# inference
# ---------------------------------------------------------------------------


def _boxes_from_masks(binm: jnp.ndarray) -> jnp.ndarray:
    """Binary masks [N, H, W] -> XYXY boxes in mask-pixel space (extent of
    the true region; empty mask -> degenerate box with x2 <= x1)."""
    n, h, w = binm.shape
    rows = jnp.any(binm, axis=2)                           # [N, H]
    cols = jnp.any(binm, axis=1)                           # [N, W]
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    y1 = jnp.min(jnp.where(rows, ys, h), axis=1)
    y2 = jnp.max(jnp.where(rows, ys + 1.0, 0.0), axis=1)
    x1 = jnp.min(jnp.where(cols, xs, w), axis=1)
    x2 = jnp.max(jnp.where(cols, xs + 1.0, 0.0), axis=1)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


@functools.partial(jax.jit, static_argnames=("cfg", "with_masks"))
def forward_query(params: Params, images_u8: jnp.ndarray,
                  cfg: DetectorConfig, with_masks: bool = True
                  ) -> Detections:
    """uint8/float [B, S, S, 3] -> padded `Detections` (same contract as the
    R-CNN head): top `max_detections` queries by class-prob x mask
    confidence, boxes from mask extents, `mask_size` ROI mask crops."""
    images = images_u8.astype(jnp.float32) / 255.0
    cls, mlog = _decode(params, images, cfg)[-1]
    size = cfg.image_size
    hm = mlog.shape[2]

    def finalize(cls_i, mlog_i):
        probs = jax.nn.softmax(cls_i, axis=-1)[:, :-1]     # [Q, C]
        cls_score = jnp.max(probs, axis=-1)
        classes = jnp.argmax(probs, axis=-1).astype(jnp.int32)
        p = jax.nn.sigmoid(mlog_i)                         # [Q, Hm, Wm]
        binm = p > 0.5
        area = binm.sum((1, 2)).astype(jnp.float32)
        conf = jnp.where(area > 0,
                         (p * binm).sum((1, 2)) / jnp.maximum(area, 1.0),
                         0.0)
        score = cls_score * conf
        top, idx = jax.lax.top_k(score, cfg.max_detections)
        boxes_m = _boxes_from_masks(binm[idx])             # mask-pixel space
        nonempty = boxes_m[:, 2] > boxes_m[:, 0]
        keep = (top > cfg.score_threshold) & nonempty
        boxes = boxes_m * (size / hm)
        if with_masks:
            feat = jnp.transpose(p[idx], (1, 2, 0))        # [Hm, Wm, N]
            crops = roi_align(feat, boxes_m, cfg.mask_size,
                              sampling_ratio=1)            # [N, m, m, N]
            n = cfg.max_detections
            masks = jnp.einsum("nijm,nm->nij", crops,
                               jnp.eye(n, dtype=crops.dtype))
            masks = jnp.clip(masks, 0.0, 1.0) * keep[:, None, None]
        else:
            masks = jnp.zeros((cfg.max_detections, cfg.mask_size,
                               cfg.mask_size))
        return Detections(
            boxes=boxes * keep[:, None], classes=classes[idx] * keep,
            scores=top * keep, logits=probs[idx] * keep[:, None],
            valid=keep, masks=masks)

    return jax.vmap(finalize)(cls, mlog)
