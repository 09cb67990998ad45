"""Teacher-student detector distillation pipelines.

Parity with the reference's orchestration layer (ref: experimenting_env/
pipelines.py): `HabitatDataModule` (:79-256 — runs policy.generate() when the
dataset is missing, pseudo-labels it once), `TeacherStudent` (:322-581 —
frozen teacher = consensus labeler over a pretrained detector, trainable
student with a selectable head loss, torchmetrics-MAP validation),
`OnlineTeacherStudent` (:625-661 — per-batch online distillation),
`Pipeline.collect_pseudolabeled_dataset` / `fit_student_and_update_teacher` /
`save_teacher_and_update_configs` (:664-877), `OnlinePipeline` /
`GTPipeline` / `SWAPipeline` (:879-985), and the BYOL-EMA teacher update
(:703-708 ema callback).

The lightning machinery is replaced by plain optax loops whose train step is
one jit; EMA and SWA are pure pytree maps.
"""

from __future__ import annotations

import functools
import os
import pickle
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import ExperimentConfig
from ..labeling.datasets import EpisodeDetectionDataset, Sample, collate
from ..labeling.pseudolabeler import CONSENSUS_REGISTRY, ConsensusLabeler
from ..models import detector as DET
from ..ops.detections import Detections
from ..utils.metrics import evaluate_detections


def ema_update(teacher: dict, student: dict, decay: float = 0.996) -> dict:
    """BYOL-style EMA teacher <- student (ref: pipelines.py:703-708)."""
    return jax.tree_util.tree_map(
        lambda t, s: decay * t + (1.0 - decay) * s, teacher, student)


def swa_average(snapshots: List[dict]) -> dict:
    """Stochastic weight averaging (ref: SWAPipeline :974-985)."""
    n = len(snapshots)
    return jax.tree_util.tree_map(lambda *xs: sum(xs) / n, *snapshots)


def mixup_batch(batch: Dict[str, np.ndarray], rng: np.random.Generator,
                alpha: float = 0.2) -> Dict[str, np.ndarray]:
    """Image mixup within a batch; box/class targets are the union of the
    two mixed frames (ref: pipelines.py training_step's optional
    mixup_batch). Detections are padded, so the union concatenates valid
    slots up to capacity."""
    lam = float(rng.beta(alpha, alpha))
    perm = rng.permutation(batch["image"].shape[0])
    out = dict(batch)
    out["image"] = (lam * batch["image"].astype(np.float32)
                    + (1 - lam) * batch["image"][perm].astype(np.float32)
                    ).astype(batch["image"].dtype)
    n = batch["boxes"].shape[1]
    boxes, classes, logits, valid = (batch["boxes"].copy(),
                                     batch["classes"].copy(),
                                     batch["logits"].copy(),
                                     batch["valid"].copy())
    for b in range(len(perm)):
        src = perm[b]
        free = np.nonzero(~valid[b])[0]
        take = np.nonzero(batch["valid"][src])[0][: len(free)]
        if len(take):
            sel = free[: len(take)]
            boxes[b, sel] = batch["boxes"][src, take]
            classes[b, sel] = batch["classes"][src, take]
            logits[b, sel] = batch["logits"][src, take]
            valid[b, sel] = True
    out.update(boxes=boxes, classes=classes, logits=logits, valid=valid)
    return out


def make_lr_schedule(kind: str = "constant", lr: float = 1e-4,
                     warmup_steps: int = 100, total_steps: int = 10_000):
    """LR schedules for the scheduler trainer variants
    (ref: multi_stage_models.py:333-456 LR-scheduler subclasses)."""
    import optax as _optax

    if kind == "constant":
        return lr
    if kind == "cosine":
        return _optax.warmup_cosine_decay_schedule(
            0.0, lr, warmup_steps, total_steps)
    if kind == "step":
        return _optax.piecewise_constant_schedule(
            lr, {total_steps // 2: 0.1, (3 * total_steps) // 4: 0.1})
    raise ValueError(f"unknown schedule {kind!r}")


class TeacherStudent:
    """Frozen teacher (via a consensus labeler) distills into a trainable
    student detector (ref: pipelines.py:322-581)."""

    def __init__(self, cfg: ExperimentConfig, consensus: str = "soft",
                 head: str = "focal", lr: float = 1e-4,
                 student_params: Optional[dict] = None,
                 teacher_params: Optional[dict] = None, seed: int = 0):
        self.cfg = cfg
        self.head = head
        self.lr = lr
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        self.student = student_params or DET.init_detector(k1, cfg.detector)
        self.teacher = teacher_params or jax.tree_util.tree_map(
            jnp.copy, self.student)
        labeler_cls = CONSENSUS_REGISTRY[consensus]
        self.labeler: ConsensusLabeler = labeler_cls(cfg)
        # the labeler's perceiver should detect with the TEACHER weights
        self.labeler.perceiver.params = self.labeler.perceiver.params._replace(
            detector=self.teacher)
        self.optimizer = optax.chain(optax.clip_by_global_norm(1.0),
                                     optax.adamw(lr))
        self.opt_state = self.optimizer.init(self.student)
        self._step = jnp.zeros((), jnp.int32)

    # -- steps -------------------------------------------------------------
    @functools.partial(jax.jit, static_argnames=("self", "head"))
    def _train_step(self, student, opt_state, images, gt: Detections,
                    head: str):
        (loss, aux), grads = jax.value_and_grad(
            lambda p: DET.detector_loss(p, images, gt, self.cfg.detector,
                                        head=head), has_aux=True)(student)
        updates, opt_state = self.optimizer.update(grads, opt_state, student)
        student = optax.apply_updates(student, updates)
        return student, opt_state, loss, aux

    def _to_detector_scale(self, batch: Dict[str, np.ndarray]):
        """Resize images (and scale boxes) to the detector's square input."""
        from ..ops.image import resize_bilinear

        size = self.cfg.detector.image_size
        images = jnp.asarray(batch["image"])
        h, w = images.shape[1:3]
        boxes = jnp.asarray(batch["boxes"], jnp.float32)
        if (h, w) != (size, size):
            images = jnp.clip(resize_bilinear(
                images.astype(jnp.float32), size, size), 0, 255
            ).astype(jnp.uint8)
            boxes = boxes * jnp.asarray([size / w, size / h,
                                         size / w, size / h])
        return images, boxes

    def training_step(self, batch: Dict[str, np.ndarray]
                      ) -> Dict[str, float]:
        images, boxes = self._to_detector_scale(batch)
        gt = Detections(
            boxes=boxes,
            classes=jnp.asarray(batch["classes"]),
            scores=jnp.asarray(batch["valid"], jnp.float32),
            logits=jnp.asarray(batch["logits"]),
            valid=jnp.asarray(batch["valid"]))
        self.student, self.opt_state, loss, aux = self._train_step(
            self.student, self.opt_state, images, gt, self.head)
        return {"loss": float(loss),
                **{k: float(v) for k, v in aux.items()}}

    def validate(self, dataset: EpisodeDetectionDataset,
                 batch_size: int = 4, max_batches: int = 16
                 ) -> Dict[str, float]:
        """mAP of the student vs dataset labels (ref: validation MAP,
        pipelines.py:519-545)."""
        preds, gts = [], []
        for bi, batch in enumerate(dataset.batches(batch_size)):
            if bi >= max_batches:
                break
            images, boxes = self._to_detector_scale(batch)
            det = DET.forward(self.student, images, self.cfg.detector,
                              with_masks=False)
            for b in range(images.shape[0]):
                preds.append(Detections(
                    boxes=det.boxes[b], classes=det.classes[b],
                    scores=det.scores[b], logits=det.logits[b],
                    valid=det.valid[b]))
                gts.append(Detections(
                    boxes=boxes[b],
                    classes=jnp.asarray(batch["classes"][b]),
                    scores=jnp.asarray(batch["valid"][b], jnp.float32),
                    logits=jnp.asarray(batch["logits"][b]),
                    valid=jnp.asarray(batch["valid"][b])))
        m = evaluate_detections(preds, gts, self.cfg.detector.num_classes)
        return {"val_map_50": m["map"]}

    def update_teacher_ema(self, decay: float = 0.996) -> None:
        self.teacher = ema_update(self.teacher, self.student, decay)
        self.labeler.perceiver.params = self.labeler.perceiver.params._replace(
            detector=self.teacher)

    def replace_teacher(self) -> None:
        """teacher <- student (ref: save_teacher_and_update_configs
        :861-877)."""
        self.teacher = jax.tree_util.tree_map(jnp.copy, self.student)
        self.labeler.perceiver.params = self.labeler.perceiver.params._replace(
            detector=self.teacher)


class OnlineTeacherStudent(TeacherStudent):
    """Teacher pseudo-labels each batch on the fly
    (ref: pipelines.py:625-661)."""

    def training_step(self, batch: Dict[str, np.ndarray]
                      ) -> Dict[str, float]:
        images, _ = self._to_detector_scale(batch)
        det = DET.forward(self.teacher, images, self.cfg.detector,
                          with_masks=False)
        gt = Detections(
            boxes=det.boxes, classes=det.classes, scores=det.scores,
            logits=det.logits, valid=det.valid)
        self.student, self.opt_state, loss, aux = self._train_step(
            self.student, self.opt_state, images, gt, self.head)
        return {"loss": float(loss),
                **{k: float(v) for k, v in aux.items()}}


class Pipeline:
    """End-to-end: explore -> pseudo-label -> fit student -> refresh teacher
    (ref: pipelines.py:664-877)."""

    # subclasses swap the teacher-student flavour here — building the base
    # TeacherStudent and discarding it would double-pay detector+perceiver
    # init and silently drop the caller's consensus choice
    TS_CLS = TeacherStudent

    def __init__(self, cfg: ExperimentConfig, trainer_name: str =
                 "randombaseline", consensus: str = "soft",
                 head: str = "focal", use_ema: bool = False):
        self.cfg = cfg
        self.trainer_name = trainer_name
        self.ts = self.TS_CLS(cfg, consensus=consensus, head=head)
        self.use_ema = use_ema

    def collect_pseudolabeled_dataset(self, obs_dir: str,
                                      num_steps: Optional[int] = None,
                                      ) -> List[Sample]:
        """policy.generate() if the dataset is missing, then pseudo-label it
        (ref: :713-798 + HabitatDataModule.prepare_data)."""
        from ..agents.registry import get_trainer
        import embodied_captioning_tpu.agents.baselines  # noqa: F401
        import embodied_captioning_tpu.agents.goal_exploration  # noqa: F401

        if not os.path.exists(obs_dir) or not os.listdir(obs_dir):
            import dataclasses as dc

            gen_cfg = dc.replace(self.cfg, runtime=dc.replace(
                self.cfg.runtime, obs_dir=obs_dir))
            trainer = get_trainer(self.trainer_name)(
                gen_cfg, perceiver=self.ts.labeler.perceiver)
            trainer.generate(num_steps)
        dataset = EpisodeDetectionDataset(obs_dir, label_modality="bbs",
                                          with_depth_pose=True)
        preds = self.ts.labeler.predict(dataset)
        return self.ts.labeler.get_pseudo_labels(preds)

    @staticmethod
    def _batch_starts(n: int, batch_size: int):
        """Full batches, dropping the tail (fixed-shape jit) — but a round
        smaller than one batch trains on what it has (a single undersized
        batch; zero training steps would silently waste the round)."""
        starts = list(range(0, n - batch_size + 1, batch_size))
        if not starts and n > 0:
            return [0], n
        return starts, batch_size

    def fit_student(self, labeled: List[Sample], epochs: int = 1,
                    batch_size: int = 4) -> List[Dict[str, float]]:
        logs = []
        starts, bs = self._batch_starts(len(labeled), batch_size)
        for _ in range(epochs):
            for i in starts:
                batch = collate(labeled[i:i + bs])
                logs.append(self.ts.training_step(batch))
                if self.use_ema:
                    self.ts.update_teacher_ema()
        return logs

    def run_round(self, obs_dir: str, num_steps: Optional[int] = None,
                  epochs: int = 1) -> List[Dict[str, float]]:
        labeled = self.collect_pseudolabeled_dataset(obs_dir, num_steps)
        logs = self.fit_student(labeled, epochs)
        # an untrained-this-round student must not overwrite the teacher
        if logs and not self.use_ema:
            self.ts.replace_teacher()
        return logs

    # -- persistence -------------------------------------------------------
    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "wb") as fh:
            pickle.dump({
                "teacher": jax.tree_util.tree_map(np.asarray,
                                                  self.ts.teacher),
                "student": jax.tree_util.tree_map(np.asarray,
                                                  self.ts.student),
            }, fh)

    def load(self, path: str) -> None:
        with open(path, "rb") as fh:
            d = pickle.load(fh)
        self.ts.teacher = jax.tree_util.tree_map(jnp.asarray, d["teacher"])
        self.ts.student = jax.tree_util.tree_map(jnp.asarray, d["student"])


class GTPipeline(Pipeline):
    """Train on ground-truth labels (ref: :927-971): the dataset's bbsgt
    modality is used directly, no consensus."""

    def collect_pseudolabeled_dataset(self, obs_dir, num_steps=None):
        dataset = EpisodeDetectionDataset(obs_dir, label_modality="bbsgt",
                                          with_depth_pose=False)
        return [dataset[i] for i in range(len(dataset))]


class OnlinePipeline(Pipeline):
    """Online distillation variant (ref: :879-924)."""

    TS_CLS = OnlineTeacherStudent


class SWAPipeline(Pipeline):
    """Keeps student snapshots and averages them at the end
    (ref: :974-985)."""

    def __init__(self, cfg, snapshot_every: int = 50, **kw):
        super().__init__(cfg, **kw)
        self.snapshot_every = snapshot_every
        self._snapshots: List[dict] = []
        self._count = 0

    def fit_student(self, labeled, epochs: int = 1, batch_size: int = 4):
        logs = []
        starts, bs = self._batch_starts(len(labeled), batch_size)
        for _ in range(epochs):
            for i in starts:
                batch = collate(labeled[i:i + bs])
                logs.append(self.ts.training_step(batch))
                if self.use_ema:  # SWA composes with an EMA teacher
                    self.ts.update_teacher_ema()
                self._count += 1
                if self._count % self.snapshot_every == 0:
                    self._snapshots.append(jax.tree_util.tree_map(
                        jnp.copy, self.ts.student))
        if self._snapshots:
            self.ts.student = swa_average(
                self._snapshots + [self.ts.student])
        return logs
