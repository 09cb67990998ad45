"""Fixed-capacity detection container (TPU-native `Instances` replacement).

The reference passes detectron2 ``Instances`` (ragged, per-frame variable
length) between detector, captioner, voxel map and storage
(ref: experimenting_env/utils/predictor_utils.py:338-379). On TPU everything
is traced with static shapes, so detections live in a padded, masked struct
registered as a JAX pytree: every per-frame tensor has leading dim
``capacity`` and a boolean ``valid`` mask. Batch versions simply add a
leading batch axis to every field.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import NUM_CLASSES


@jax.tree_util.register_pytree_node_class
@dataclass
class Detections:
    """Padded per-frame (or batched) detections.

    boxes      [..., N, 4] float32, XYXY pixel coords
    classes    [..., N]    int32, local class ids 0..5
    scores     [..., N]    float32
    logits     [..., N, C] float32 class logits/probs ("gt_logits" in the ref)
    masks      [..., N, Hm, Wm] float32 mask (prob or {0,1}); may be None
    embeddings [..., N, D] float32 caption embedding; may be None
    captions   host-side object array of caption token arrays / strings; None
               on device (non-pytree aux data is not traced)
    object_ids [..., N] int32 persistent instance id (-1 = unassigned)
    episode_ids[..., N] int32
    valid      [..., N]  bool
    """

    boxes: jnp.ndarray
    classes: jnp.ndarray
    scores: jnp.ndarray
    logits: jnp.ndarray
    valid: jnp.ndarray
    masks: Optional[jnp.ndarray] = None
    embeddings: Optional[jnp.ndarray] = None
    object_ids: Optional[jnp.ndarray] = None
    episode_ids: Optional[jnp.ndarray] = None
    captions: Optional[Any] = None  # aux (host only)

    # -- pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        children = (self.boxes, self.classes, self.scores, self.logits,
                    self.valid, self.masks, self.embeddings, self.object_ids,
                    self.episode_ids)
        return children, self.captions

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, captions=aux)

    # -- constructors ------------------------------------------------------
    @staticmethod
    def empty(capacity: int, num_classes: int = NUM_CLASSES,
              mask_size: Optional[int] = None,
              embed_dim: Optional[int] = None) -> "Detections":
        n = capacity
        return Detections(
            boxes=jnp.zeros((n, 4), jnp.float32),
            classes=jnp.zeros((n,), jnp.int32),
            scores=jnp.zeros((n,), jnp.float32),
            logits=jnp.zeros((n, num_classes), jnp.float32),
            valid=jnp.zeros((n,), bool),
            masks=(jnp.zeros((n, mask_size, mask_size), jnp.float32)
                   if mask_size else None),
            embeddings=(jnp.zeros((n, embed_dim), jnp.float32)
                        if embed_dim else None),
            object_ids=jnp.full((n,), -1, jnp.int32),
            episode_ids=jnp.full((n,), -1, jnp.int32),
        )

    # -- util --------------------------------------------------------------
    @property
    def capacity(self) -> int:
        return self.boxes.shape[-2]

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32), axis=-1)

    def index(self, i: int) -> "Detections":
        """One batch row: every non-None array field sliced at `i` (None
        fields pass through — they are empty pytree nodes). Prefer this
        over hand-copying fields, which silently drops any field the copy
        site forgot (object_ids/episode_ids already bit two call sites)."""
        import jax

        return jax.tree_util.tree_map(lambda a: a[i], self)

    def replace(self, **kw) -> "Detections":
        return dataclasses.replace(self, **kw)

    def to_numpy_dict(self) -> Dict[str, Any]:
        """Host-side serializable payload (written into `bbs` npz files)."""
        out: Dict[str, Any] = {}
        for f in ("boxes", "classes", "scores", "logits", "valid", "masks",
                  "embeddings", "object_ids", "episode_ids"):
            v = getattr(self, f)
            if v is not None:
                out[f] = np.asarray(v)
        if self.captions is not None:
            out["captions"] = self.captions
        return out

    @staticmethod
    def from_numpy_dict(d: Dict[str, Any]) -> "Detections":
        return Detections(
            boxes=jnp.asarray(d["boxes"]),
            classes=jnp.asarray(d["classes"]),
            scores=jnp.asarray(d["scores"]),
            logits=jnp.asarray(d["logits"]),
            valid=jnp.asarray(d["valid"]),
            masks=jnp.asarray(d["masks"]) if "masks" in d else None,
            embeddings=(jnp.asarray(d["embeddings"])
                        if "embeddings" in d else None),
            object_ids=(jnp.asarray(d["object_ids"])
                        if "object_ids" in d else None),
            episode_ids=(jnp.asarray(d["episode_ids"])
                         if "episode_ids" in d else None),
            captions=d.get("captions"),
        )


def boxes_from_masks(masks: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """XYXY boxes from [N, H, W] {0,1} masks (the reference derives pred_boxes
    via cv2.boundingRect of each mask, ref: predictor_utils.py:348-352).
    Fully vectorized: per-mask row/col extents."""
    n, h, w = masks.shape
    on = masks > 0.5
    cols = jnp.any(on, axis=1)  # [N, W]
    rows = jnp.any(on, axis=2)  # [N, H]
    xs = jnp.arange(w)[None, :]
    ys = jnp.arange(h)[None, :]
    big = jnp.int32(1 << 30)
    x1 = jnp.min(jnp.where(cols, xs, big), axis=1)
    x2 = jnp.max(jnp.where(cols, xs, -1), axis=1) + 1
    y1 = jnp.min(jnp.where(rows, ys, big), axis=1)
    y2 = jnp.max(jnp.where(rows, ys, -1), axis=1) + 1
    boxes = jnp.stack([x1, y1, x2, y2], axis=-1).astype(jnp.float32)
    any_on = jnp.any(on, axis=(1, 2)) & valid
    return jnp.where(any_on[:, None], boxes, 0.0)


def pairwise_iou(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """IoU matrix [A, B] between XYXY boxes (detectron2 pairwise_iou parity,
    used for instance matching, ref: utils/matching.py:17-43)."""
    area_a = jnp.maximum(boxes_a[:, 2] - boxes_a[:, 0], 0) * jnp.maximum(
        boxes_a[:, 3] - boxes_a[:, 1], 0)
    area_b = jnp.maximum(boxes_b[:, 2] - boxes_b[:, 0], 0) * jnp.maximum(
        boxes_b[:, 3] - boxes_b[:, 1], 0)
    lt = jnp.maximum(boxes_a[:, None, :2], boxes_b[None, :, :2])
    rb = jnp.minimum(boxes_a[:, None, 2:], boxes_b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def expand_boxes(boxes: jnp.ndarray, ratio: float, height: int,
                 width: int) -> jnp.ndarray:
    """Expand XYXY boxes by `ratio` on each side, clamped to the image (the
    reference expands crop boxes by 0.2 before captioning,
    ref: detector/pseudolabeler.py:653-672)."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    x1 = jnp.clip(boxes[..., 0] - ratio * w, 0, width - 1)
    y1 = jnp.clip(boxes[..., 1] - ratio * h, 0, height - 1)
    x2 = jnp.clip(boxes[..., 2] + ratio * w, 0, width)
    y2 = jnp.clip(boxes[..., 3] + ratio * h, 0, height)
    return jnp.stack([x1, y1, x2, y2], axis=-1)
