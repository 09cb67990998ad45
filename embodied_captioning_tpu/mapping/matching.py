"""Prediction <-> ground-truth instance-ID assignment.

Parity with the reference's matching module
(ref: experimenting_env/utils/matching.py): detections get persistent object
ids either by best-IoU match against labeled instances (``_get_objects_ids_impl``,
thr 0.3, fresh ids from a counter starting at 500) or always-fresh unique ids
(``_get_objects_unique_ids_impl``, counter from 5,000,000 — the behavior at
reference HEAD). Here the id counter is explicit state (no function
attributes) and the IoU step is a jit-able matrix op.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.detections import Detections, pairwise_iou

FRESH_ID_START_MATCHED = 500        # ref: matching.py:117
FRESH_ID_START_UNIQUE = 5_000_000   # ref: matching.py:158


@dataclass
class IdAllocator:
    """Monotonic unique-id source (replaces the reference's hidden
    ``get_objects_ids.current_unique_id`` function attribute)."""

    next_id: int = FRESH_ID_START_UNIQUE

    def take(self, n: int) -> np.ndarray:
        ids = np.arange(self.next_id, self.next_id + n, dtype=np.int64)
        self.next_id += n
        return ids


def match_ids_iou(pred: Detections, gt: Detections, allocator: IdAllocator,
                  episode: int, thr: float = 0.3,
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Best-IoU id assignment (ref: matching.py:111-153): each valid
    prediction inherits the object id of its best-overlapping GT instance if
    IoU > thr, else receives a fresh unique id. Returns
    (object_ids [N] int64, episode_ids [N] int64) as host arrays."""
    n = pred.capacity
    pv = np.asarray(pred.valid)
    gv = np.asarray(gt.valid)
    out_ids = np.full((n,), -1, np.int64)
    out_eps = np.full((n,), -1, np.int64)
    if gv.any():
        iou = np.asarray(pairwise_iou(jnp.asarray(pred.boxes),
                                      jnp.asarray(gt.boxes)))
        iou = iou * gv[None, :]
    else:
        iou = np.zeros((n, max(gt.capacity, 1)))
    gt_obj = (np.asarray(gt.object_ids) if gt.object_ids is not None
              else np.full((gt.capacity,), -1))
    for i in np.nonzero(pv)[0]:
        j = int(np.argmax(iou[i])) if iou.shape[1] else 0
        if iou.shape[1] and iou[i, j] > thr and gt_obj[j] >= 0:
            out_ids[i] = gt_obj[j]
        else:
            out_ids[i] = allocator.take(1)[0]
        out_eps[i] = episode
    return out_ids, out_eps


def unique_ids(pred: Detections, allocator: IdAllocator, episode: int,
               ) -> Tuple[np.ndarray, np.ndarray]:
    """Always-fresh ids (ref: matching.py:156-171 — the behavior actually in
    force at reference HEAD: every detection is a new observation-object;
    merging happens later in the map)."""
    n = pred.capacity
    pv = np.asarray(pred.valid)
    out_ids = np.full((n,), -1, np.int64)
    out_eps = np.full((n,), -1, np.int64)
    k = int(pv.sum())
    fresh = allocator.take(k)
    out_ids[np.nonzero(pv)[0]] = fresh
    out_eps[pv] = episode
    return out_ids, out_eps
