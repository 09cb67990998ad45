"""Detection consensus pseudo-labelers + the consensus captioner.

Parity with the reference's family (ref: experimenting_env/detector/
pseudolabeler.py): `ConsensusLabeler` base (:49-100), `VanillaConsensusLabeler`
(:103-137), `SoftConsensusLabeler` (temperature-softmax mean of logits per
matched instance, :269-356), `MajorityConsensusLabeler` (:359-448),
`MaxScoreConsensusLabeler` (:451-542), `SemanticMapConsensusLabeler`
(per-episode voxel maps + raytraced pseudo-masks, :140-266) and
`SemanticMapConsensusCaptioner` (detector+captioner+SBERT fused through the
map, re-captioning raytraced instances, :549-845).

TPU-native differences: predictions come from the fused perception program
(one jit per batch), per-episode maps are device VoxelMapStates, and
raytracing is the exact voxel lookup (mapping/voxel_map.py) instead of a
KDTree. Outputs are npz `bbs` payloads in the reference schema.
"""

from __future__ import annotations

import os
from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ExperimentConfig, NUM_CLASSES
from ..mapping import voxel_map as V
from ..mapping.matching import IdAllocator
from ..ops.detections import Detections, pairwise_iou
from ..perception import Perceiver
from ..utils.obs_store import save_obs
from .datasets import EpisodeDetectionDataset, Sample


class ConsensusLabeler:
    """Base: run the detector over a dataset, assign instance ids by IoU
    against per-frame labels, let subclasses fuse per-instance labels."""

    def __init__(self, cfg: ExperimentConfig,
                 perceiver: Optional[Perceiver] = None):
        self.cfg = cfg
        self.perceiver = perceiver or Perceiver(cfg)
        self.alloc = IdAllocator()

    # -- stage 1: predict over the dataset --------------------------------
    def predict(self, dataset: EpisodeDetectionDataset, batch_size: int = 8
                ) -> List[Sample]:
        """Returns per-frame predicted Samples with matched object ids
        (ref: ConsensusLabeler.predict_step returns (preds, ids))."""
        outs: List[Sample] = []
        for batch in dataset.batches(batch_size):
            result = self.perceiver.process(batch["image"])
            det = result.detections
            for b in range(batch["image"].shape[0]):
                pred = self._build_sample(det, batch, b)
                pred.object_ids = self._match_ids(pred, batch, b)
                self._collect(pred, det, result, b)
                outs.append(pred)
        return outs

    def _build_sample(self, det: Detections, batch, b: int) -> Sample:
        # np.array (copy), NOT np.asarray: jax arrays view as READ-ONLY
        # numpy, and the consensus stages write labels in place
        n = det.valid.shape[1]
        pred = Sample(
            image=batch["image"][b],
            boxes=np.array(det.boxes[b]),
            classes=np.array(det.classes[b]),
            logits=np.array(det.logits[b]),
            masks=np.array(det.masks[b]),
            valid=np.array(det.valid[b]),
            scores=np.array(det.scores[b]),
            object_ids=np.full((n,), -1, np.int64),
            episode=int(batch["episode"][b]),
            step=int(batch["step"][b]),
        )
        if det.embeddings is not None:
            pred.embeddings = np.array(det.embeddings[b])
        if "depth" in batch:
            pred.depth = batch["depth"][b]
        if "pose" in batch:
            pred.pose = batch["pose"][b]
        return pred

    def _collect(self, pred: Sample, det: Detections, result, b: int
                 ) -> None:
        """Hook for subclasses that harvest extra per-frame outputs
        (captions, embeddings) from the perception result."""

    def _match_ids(self, pred: Sample, batch, b) -> np.ndarray:
        """IoU-match predictions to the frame's labeled instances to inherit
        persistent ids; unmatched get fresh ids (ref: utils/matching.py
        _get_objects_ids_impl, thr 0.3)."""
        n = len(pred.valid)
        ids = np.full((n,), -1, np.int64)
        gt_boxes = batch["boxes"][b]
        gt_valid = batch["valid"][b]
        gt_ids = batch["object_ids"][b]
        iou = np.asarray(pairwise_iou(jnp.asarray(pred.boxes),
                                      jnp.asarray(gt_boxes)))
        iou = iou * gt_valid[None, :]
        for i in np.nonzero(pred.valid)[0]:
            j = int(np.argmax(iou[i])) if iou.shape[1] else 0
            if iou.shape[1] and iou[i, j] > 0.3 and gt_ids[j] >= 0:
                ids[i] = gt_ids[j]
            else:
                ids[i] = self.alloc.take(1)[0]
        return ids

    # -- stage 2: consensus ------------------------------------------------
    def get_pseudo_labels(self, preds: List[Sample]) -> List[Sample]:
        raise NotImplementedError

    # -- io ----------------------------------------------------------------
    @staticmethod
    def save_pseudo_labels(preds: List[Sample], out_dir: str) -> List[str]:
        """Write per-frame `bbs` npz payloads (ref: pseudolabeler writes
        frame npz files to pseudolabeler.output_folder)."""
        paths = []
        for p in preds:
            # real per-detection confidence when the predictor provided it
            # (uniform 1.0 would defeat downstream score thresholding);
            # fall back to max class prob, then to the validity mask
            if p.scores is not None:
                scores = np.asarray(p.scores, np.float32)
            elif p.logits is not None:
                scores = p.logits.max(-1).astype(np.float32)
            else:
                scores = p.valid.astype(np.float32)
            payload = {
                "boxes": p.boxes, "classes": p.classes, "logits": p.logits,
                "valid": p.valid, "object_ids": p.object_ids,
                "scores": scores * p.valid,
            }
            if p.masks is not None:
                payload["masks"] = p.masks
            obs = {"bbs": np.array({"instances": payload}, dtype=object)}
            paths += save_obs(out_dir, p.episode, obs, p.step)
        return paths


class VanillaConsensusLabeler(ConsensusLabeler):
    """Predictions become labels unchanged (ref :103-137)."""

    def get_pseudo_labels(self, preds: List[Sample]) -> List[Sample]:
        return preds


def _group_by_object(preds: List[Sample]):
    groups: Dict[Tuple[int, int], List[Tuple[Sample, int]]] = defaultdict(list)
    for p in preds:
        for i in np.nonzero(p.valid)[0]:
            groups[(p.episode, int(p.object_ids[i]))].append((p, int(i)))
    return groups


class SoftConsensusLabeler(ConsensusLabeler):
    """Per-instance soft logits: temperature-softmax of the mean logits over
    all views of the matched instance (ref :269-356)."""

    def __init__(self, cfg, temperature: float = 2.0, **kw):
        super().__init__(cfg, **kw)
        self.temperature = temperature

    def get_pseudo_labels(self, preds: List[Sample]) -> List[Sample]:
        groups = _group_by_object(preds)
        fused: Dict[Tuple[int, int], np.ndarray] = {}
        for key, items in groups.items():
            logits = np.stack([p.logits[i] for p, i in items])
            mean = logits.mean(0) / self.temperature
            e = np.exp(mean - mean.max())
            fused[key] = (e / e.sum()).astype(np.float32)
        for p in preds:
            for i in np.nonzero(p.valid)[0]:
                soft = fused[(p.episode, int(p.object_ids[i]))]
                p.logits[i] = soft
                p.classes[i] = int(soft.argmax())
        return preds


class MajorityConsensusLabeler(ConsensusLabeler):
    """Majority class vote per instance; minority-view detections are
    relabeled to the winning class (ref :359-448)."""

    def get_pseudo_labels(self, preds: List[Sample]) -> List[Sample]:
        groups = _group_by_object(preds)
        winner: Dict[Tuple[int, int], int] = {}
        for key, items in groups.items():
            votes = np.bincount([p.classes[i] for p, i in items],
                                minlength=NUM_CLASSES)
            winner[key] = int(votes.argmax())
        for p in preds:
            for i in np.nonzero(p.valid)[0]:
                c = winner[(p.episode, int(p.object_ids[i]))]
                p.classes[i] = c
                one = np.zeros(NUM_CLASSES, np.float32)
                one[c] = 1.0
                p.logits[i] = one
        return preds


class MaxScoreConsensusLabeler(ConsensusLabeler):
    """Each instance keeps the class/logits of its single highest-scoring
    view (ref :451-542)."""

    def get_pseudo_labels(self, preds: List[Sample]) -> List[Sample]:
        groups = _group_by_object(preds)
        best: Dict[Tuple[int, int], Tuple[np.ndarray, int]] = {}
        for key, items in groups.items():
            scores = [float(p.logits[i].max()) for p, i in items]
            p, i = items[int(np.argmax(scores))]
            best[key] = (p.logits[i].copy(), int(p.classes[i]))
        for p in preds:
            for i in np.nonzero(p.valid)[0]:
                lg, c = best[(p.episode, int(p.object_ids[i]))]
                p.logits[i] = lg
                p.classes[i] = c
        return preds


class SemanticMapConsensusLabeler(ConsensusLabeler):
    """3D-consistent pseudo-labels: fuse every frame into a per-episode
    voxel map, then re-render each frame's labels by raytracing the map
    (ref :140-266 + projection_utils._depth_raytracing)."""

    def __init__(self, cfg, **kw):
        super().__init__(cfg, **kw)
        self.global_maps: Dict[int, V.VoxelMapState] = {}

    def _map_for(self, episode: int) -> V.VoxelMapState:
        if episode not in self.global_maps:
            self.global_maps[episode] = V.create(
                self.cfg.map, lower_bound=[0.0, -0.5, 0.0], episode=episode)
        return self.global_maps[episode]

    def accumulate(self, preds: List[Sample]) -> None:
        for p in preds:
            if p.depth is None or p.pose is None:
                continue
            state = self._map_for(p.episode)
            # fuse caption embeddings into the map's per-object ring buffers
            # when the predictor produced them (SemanticMapConsensusCaptioner
            # path — embedding_disagreement needs them); zeros otherwise
            if (p.embeddings is not None
                    and p.embeddings.shape[-1] == self.cfg.map.embed_dim):
                emb = np.asarray(p.embeddings, np.float32)
            else:
                emb = np.zeros((len(p.valid), self.cfg.map.embed_dim),
                               np.float32)
            masks = p.masks
            if masks.shape[-2:] != p.depth.shape:
                from .datasets import _resize_masks

                masks = _resize_masks(masks, *p.depth.shape)
            self.global_maps[p.episode] = V.integrate_frame(
                state, jnp.asarray(p.depth), jnp.asarray(p.pose),
                jnp.asarray(masks), jnp.asarray(p.classes),
                jnp.asarray(p.logits), jnp.asarray(emb),
                jnp.asarray(p.valid), self.cfg.map,
                hfov_deg=self.cfg.sensors.hfov_deg,
                min_depth=self.cfg.sensors.min_depth,
                max_depth=self.cfg.sensors.max_depth)

    def get_pseudo_labels(self, preds: List[Sample]) -> List[Sample]:
        self.accumulate(preds)
        out: List[Sample] = []
        for p in preds:
            if p.depth is None or p.pose is None:
                out.append(p)
                continue
            state = self.global_maps[p.episode]
            masks, slots, classes, logits, valid = V.raytrace_pseudo_labels(
                state, jnp.asarray(p.depth), jnp.asarray(p.pose),
                self.cfg.map, hfov_deg=self.cfg.sensors.hfov_deg,
                max_objects_out=len(p.valid),
                min_pixels=max(20, p.depth.size // 2184))
            masks = np.asarray(masks).astype(np.float32)
            valid_np = np.asarray(valid)
            from ..ops.detections import boxes_from_masks

            boxes = np.asarray(boxes_from_masks(jnp.asarray(masks),
                                                jnp.asarray(valid_np)))
            out.append(Sample(
                image=p.image, boxes=boxes.astype(np.float32),
                classes=np.asarray(classes, np.int32) * valid_np,
                logits=np.asarray(logits, np.float32) * valid_np[:, None],
                masks=masks, valid=valid_np,
                object_ids=np.where(valid_np, np.asarray(slots), -1),
                depth=p.depth, pose=p.pose, episode=p.episode, step=p.step))
        return out


class SemanticMapConsensusCaptioner(SemanticMapConsensusLabeler):
    """Adds captions: detections are captioned+embedded during predict (the
    Perceiver does this natively), embeddings fuse into the map, and the
    raytraced pseudo-instances are re-captioned from their boxes
    (ref :549-845 ConsensusCaptioner/SemanticMapConsensusCaptioner)."""

    def predict(self, dataset, batch_size: int = 8) -> List[Sample]:
        self.captions: Dict[Tuple[int, int], List[str]] = defaultdict(list)
        self.embeddings: Dict[Tuple[int, int], List[np.ndarray]] = \
            defaultdict(list)
        self._caps_cache: Tuple[int, Optional[List]] = (-1, None)
        return super().predict(dataset, batch_size)

    def _collect(self, pred: Sample, det: Detections, result, b: int
                 ) -> None:
        # decode each batch's captions once (called per sample)
        if self._caps_cache[0] != id(result):
            self._caps_cache = (id(result), self.perceiver.captions(result))
        caps = self._caps_cache[1]
        for i in np.nonzero(pred.valid)[0]:
            key = (pred.episode, int(pred.object_ids[i]))
            self.captions[key].append(caps[b][int(i)])
            if pred.embeddings is not None:
                self.embeddings[key].append(pred.embeddings[i])

    def recaption(self, pseudo: List[Sample]) -> Dict[Tuple[int, int], str]:
        """Caption each raytraced pseudo-instance crop (ref :751-845 final
        re-captioning of resolved masks)."""
        out: Dict[Tuple[int, int], str] = {}
        for p in pseudo:
            idx = np.nonzero(p.valid)[0]
            if len(idx) == 0:
                continue
            result_caps = self._caption_boxes(p.image, p.boxes[idx])
            for i, c in zip(idx, result_caps):
                out[(p.episode, int(p.object_ids[i]))] = c
        return out

    def _caption_boxes(self, image: np.ndarray, boxes: np.ndarray
                       ) -> List[str]:
        from ..models.captioner import generate
        from ..ops.detections import expand_boxes
        from ..ops.image import crop_and_resize

        cfg = self.cfg.captioner
        h, w = image.shape[:2]
        # pad the box count to a power-of-two bucket: generate() compiles
        # per distinct batch shape, and per-frame detection counts vary
        # 1..N (fixed-shape convention; same bucketing as sbert.encode)
        k = len(boxes)
        cap = 1
        while cap < k:
            cap *= 2
        padded = np.zeros((cap, 4), np.float32)
        padded[:k] = boxes
        eb = expand_boxes(jnp.asarray(padded), 0.2, h, w)
        crops = crop_and_resize(jnp.asarray(image, jnp.float32), eb,
                                cfg.vision.image_size).astype(jnp.uint8)
        toks, _, _ = generate(self.perceiver.params.captioner, crops,
                              jax.random.PRNGKey(0), cfg)
        return [self.perceiver.tokenizer.decode(t)
                for t in np.asarray(toks)[:k]]


CONSENSUS_REGISTRY = {
    "vanilla": VanillaConsensusLabeler,
    "logits": SoftConsensusLabeler,
    "soft": SoftConsensusLabeler,
    "majority": MajorityConsensusLabeler,
    "max_score": MaxScoreConsensusLabeler,
    "semantic_map": SemanticMapConsensusLabeler,
    "semantic_map_captioner": SemanticMapConsensusCaptioner,
}
