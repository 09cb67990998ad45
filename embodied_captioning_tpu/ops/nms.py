"""XLA-compatible non-maximum suppression.

Replaces ``torchvision.ops.nms`` (C++/CUDA, used by the reference's custom
fast_rcnn_inference, ref: experimenting_env/utils/detectron_utils.py:64-171).
Two formulations, both static-shape and jit-able:

- :func:`nms_mask` — O(N^2) greedy NMS as a sequential scan over the
  score-sorted IoU matrix. Exact torchvision semantics.
- :func:`nms_topk` — greedy select-K loop; returns gather indices for the
  top ``max_out`` surviving boxes, which is the form the detector needs.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .detections import pairwise_iou


def nms_mask(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float,
             valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Greedy NMS keep-mask.

    Sorts by score, then walks the sorted list once with a carried "alive"
    mask: box i survives iff no higher-scoring surviving box overlaps it above
    the threshold. The walk is a `lax.scan` over rows of the sorted IoU
    matrix — N steps of O(N) vector work on the VPU, no dynamic shapes.
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))
    sboxes = boxes[order]
    svalid = valid[order]
    iou = pairwise_iou(sboxes, sboxes)

    def step(alive, i):
        keep_i = alive[i] & svalid[i]
        suppress = keep_i & (iou[i] > iou_threshold)
        suppress = suppress.at[i].set(False)
        alive = alive & ~suppress
        return alive, keep_i

    alive0 = jnp.ones((n,), bool)
    _, kept_sorted = jax.lax.scan(step, alive0, jnp.arange(n))
    inv = jnp.argsort(order)
    return kept_sorted[inv] & valid


def nms_topk(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float,
             max_out: int, valid: jnp.ndarray | None = None,
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS returning the indices of up to ``max_out`` survivors in
    score order, plus their validity mask. ``max_out`` iterations of
    argmax+suppress — the shape the fixed-capacity Detections container wants.
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    iou = pairwise_iou(boxes, boxes)
    neg = jnp.float32(-1e30)
    live_scores = jnp.where(valid, scores.astype(jnp.float32), neg)

    def step(live, _):
        best = jnp.argmax(live)
        ok = live[best] > neg * 0.5
        suppress = iou[best] > iou_threshold
        live = jnp.where(suppress | (jnp.arange(n) == best), neg, live)
        return live, (best, ok)

    _, (idx, ok) = jax.lax.scan(step, live_scores, None, length=max_out)
    return idx, ok


def class_aware_nms_topk(boxes: jnp.ndarray, scores: jnp.ndarray,
                         classes: jnp.ndarray, iou_threshold: float,
                         max_out: int, valid: jnp.ndarray | None = None,
                         coord_offset: float = 1e4,
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-class NMS via the standard coordinate-offset trick (boxes of
    different classes are translated to disjoint regions so they never
    suppress each other) — batched-NMS parity with torchvision."""
    off = classes.astype(jnp.float32)[:, None] * coord_offset
    return nms_topk(boxes + off, scores, iou_threshold, max_out, valid)
