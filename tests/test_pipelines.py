"""Teacher-student pipeline mechanics: training step, online distillation,
mixup, head re-init, LR schedules. Uses the tiny preset with a synthetic
labeled batch (the reference tests its pipelines with mocked instances,
ref: tests/test_multistage.py — ours run the real student)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from embodied_captioning_tpu.config import NUM_CLASSES, load_config

CFG = load_config("tiny")


def _batch(n=2, size=48, rng=None):
    rng = rng or np.random.default_rng(0)
    k = 4
    return {
        "image": (rng.random((n, size, size, 3)) * 255).astype(np.uint8),
        "boxes": np.tile(np.array([[4, 4, 20, 20], [26, 26, 44, 44],
                                   [0, 0, 0, 0], [0, 0, 0, 0]], np.float32),
                         (n, 1, 1)),
        "classes": np.tile(np.array([1, 3, 0, 0], np.int32), (n, 1)),
        "logits": np.tile(np.eye(NUM_CLASSES, dtype=np.float32)[[1, 3, 0, 0]],
                          (n, 1, 1)),
        "valid": np.tile(np.array([True, True, False, False]), (n, 1)),
        "object_ids": np.tile(np.array([5, 6, -1, -1]), (n, 1)),
        "episode": np.zeros(n, np.int64),
        "step": np.arange(n),
    }


def test_teacher_student_training_step_and_ema():
    from embodied_captioning_tpu.train.pipelines import TeacherStudent

    ts = TeacherStudent(CFG, consensus="vanilla", head="ce")
    before = jax.tree_util.tree_map(np.asarray, ts.student)
    out = ts.training_step(_batch())
    assert np.isfinite(out["loss"])
    diff = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()), ts.student,
        before)
    assert max(jax.tree_util.tree_leaves(diff)) > 0
    t_before = jax.tree_util.tree_map(np.asarray, ts.teacher)
    ts.update_teacher_ema(decay=0.5)
    t_diff = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()), ts.teacher,
        t_before)
    assert max(jax.tree_util.tree_leaves(t_diff)) > 0
    ts.replace_teacher()
    same = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        ts.teacher, ts.student)
    assert max(jax.tree_util.tree_leaves(same)) == 0


def test_online_teacher_student_step():
    from embodied_captioning_tpu.train.pipelines import OnlineTeacherStudent

    ts = OnlineTeacherStudent(CFG, head="ce")
    out = ts.training_step(_batch())
    assert np.isfinite(out["loss"])


def test_mixup_batch():
    from embodied_captioning_tpu.train.pipelines import mixup_batch

    rng = np.random.default_rng(0)
    b = _batch(n=4)
    mixed = mixup_batch(b, rng)
    assert mixed["image"].shape == b["image"].shape
    # union of boxes: valid count per row >= original
    assert (mixed["valid"].sum(1) >= b["valid"].sum(1)).all()


def test_reinit_heads():
    from embodied_captioning_tpu.models.detector import (
        init_detector, reinit_heads,
    )

    p = init_detector(jax.random.PRNGKey(0), CFG.detector)
    p2 = reinit_heads(p, jax.random.PRNGKey(1), CFG.detector)
    assert np.abs(np.asarray(p2["cls"]["w"]) -
                  np.asarray(p["cls"]["w"])).max() > 0
    np.testing.assert_array_equal(np.asarray(p2["stem"]["w"]),
                                  np.asarray(p["stem"]["w"]))


def test_lr_schedules():
    from embodied_captioning_tpu.train.pipelines import make_lr_schedule

    assert make_lr_schedule("constant", 1e-3) == 1e-3
    cos = make_lr_schedule("cosine", 1e-3, warmup_steps=10, total_steps=100)
    assert float(cos(0)) == 0.0
    assert float(cos(10)) == pytest.approx(1e-3)
    assert float(cos(100)) < 1e-4
    step = make_lr_schedule("step", 1e-3, total_steps=100)
    assert float(step(60)) == pytest.approx(1e-4)
    with pytest.raises(ValueError):
        make_lr_schedule("nope")
