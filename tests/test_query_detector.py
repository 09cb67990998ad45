"""Mask2Former-class query detector (models/query_detector.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from embodied_captioning_tpu.config import DetectorConfig
from embodied_captioning_tpu.models import detector as DET
from embodied_captioning_tpu.models.query_detector import _set_loss_one
from embodied_captioning_tpu.ops.detections import Detections

QCFG = DetectorConfig(image_size=64, backbone_width=16, fpn_dim=64,
                      family="query", num_queries=16, query_layers=3,
                      max_detections=8, score_threshold=0.1)


def _gt_batch(rng, b, g, size, num_classes=6):
    x1 = rng.uniform(4, size - 24, (b, g))
    y1 = rng.uniform(4, size - 24, (b, g))
    boxes = np.stack([x1, y1, x1 + rng.uniform(10, 20, (b, g)),
                      y1 + rng.uniform(10, 20, (b, g))], -1)
    masks = np.zeros((b, g, size, size), np.uint8)
    imgs = np.full((b, size, size, 3), 30, np.uint8)
    classes = rng.integers(0, num_classes, (b, g))
    valid = np.zeros((b, g), bool)
    valid[:, :2] = True  # two real objects per frame
    for i in range(b):
        for j in range(g):
            if not valid[i, j]:
                continue
            bx = boxes[i, j].astype(int)
            masks[i, j, bx[1]:bx[3], bx[0]:bx[2]] = 1
            color = np.array([40 * (classes[i, j] + 1) % 255, 80, 160])
            imgs[i, bx[1]:bx[3], bx[0]:bx[2]] = color
    return jnp.asarray(imgs), Detections(
        boxes=jnp.asarray(boxes, jnp.float32),
        classes=jnp.asarray(classes, jnp.int32),
        scores=jnp.ones((b, g), jnp.float32),
        logits=jnp.zeros((b, g, num_classes), jnp.float32),
        valid=jnp.asarray(valid), masks=jnp.asarray(masks))


def test_forward_contract():
    params = DET.init_detector(jax.random.PRNGKey(0), QCFG)
    assert "rpn_conv" not in params and "query_embed" in params
    rng = np.random.default_rng(0)
    imgs, _ = _gt_batch(rng, 2, 8, QCFG.image_size)
    det = DET.forward(params, imgs, QCFG)
    n = QCFG.max_detections
    assert det.boxes.shape == (2, n, 4)
    assert det.masks.shape == (2, n, QCFG.mask_size, QCFG.mask_size)
    assert det.logits.shape == (2, n, QCFG.num_classes)
    bx = np.asarray(det.boxes)
    assert bx.min() >= 0 and bx.max() <= QCFG.image_size
    # full-frame paste works on the query head's output (consumer contract)
    fm = DET.full_masks(det, QCFG.image_size)
    assert fm.shape == (2, n, QCFG.image_size, QCFG.image_size)


def test_hungarian_matches_obvious_assignment():
    # craft mask logits where query 3 exactly covers gt 0 and query 7
    # covers gt 1 -> matching must pick those queries
    q, g, hm, c = 10, 4, 16, 6
    mlog = np.full((q, hm, hm), -8.0, np.float32)
    gm = np.zeros((g, hm, hm), np.float32)
    gm[0, 2:8, 2:8] = 1
    gm[1, 10:14, 10:14] = 1
    mlog[3, 2:8, 2:8] = 8.0
    mlog[7, 10:14, 10:14] = 8.0
    cls = np.zeros((q, c + 1), np.float32)
    cls[3, 1] = 6.0
    cls[7, 2] = 6.0
    gt_cls = np.array([1, 2, 0, 0], np.int32)
    valid = np.array([True, True, False, False])
    loss, matched = _set_loss_one(
        jnp.asarray(cls), jnp.asarray(mlog), jnp.asarray(gt_cls),
        jnp.asarray(valid), jnp.asarray(gm), no_obj_w=0.1, num_classes=c)
    m = np.asarray(matched)
    assert m[0] == 3 and m[1] == 7
    # matched pairs are near-perfect; the residual is the no-object CE of
    # the 8 unmatched uniform-logit queries (0.1 weight x log 7 each)
    assert float(loss) < 2.0


def test_loss_decreases_and_learns():
    rng = np.random.default_rng(1)
    imgs, gt = _gt_batch(rng, 4, 8, QCFG.image_size)
    params = DET.init_detector(jax.random.PRNGKey(1), QCFG)
    import optax

    opt = optax.adam(3e-4)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        (loss, _), grads = jax.value_and_grad(
            lambda p: DET.detector_loss(p, imgs, gt, QCFG),
            has_aux=True)(params)
        upd, state = opt.update(grads, state)
        return optax.apply_updates(params, upd), state, loss

    losses = []
    for _ in range(40):
        params, state, loss = step(params, state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.7


def test_rcnn_only_paths_guarded():
    params = DET.init_detector(jax.random.PRNGKey(0), QCFG)
    acfg = dataclasses.replace(QCFG, norm="affine")
    with pytest.raises(ValueError, match="rcnn family"):
        DET.fold_affine(params, acfg)
    with pytest.raises(ValueError, match="rcnn family"):
        DET.forward_mc(params, jnp.zeros((1, 64, 64, 3), jnp.uint8),
                       jax.random.PRNGKey(0), QCFG)
    with pytest.raises(ValueError, match="head='ce'"):
        rng = np.random.default_rng(2)
        imgs, gt = _gt_batch(rng, 1, 8, QCFG.image_size)
        DET.detector_loss(params, imgs, gt, QCFG, head="focal")


def test_reinit_heads_query():
    params = DET.init_detector(jax.random.PRNGKey(0), QCFG)
    out = DET.reinit_heads(params, jax.random.PRNGKey(1), QCFG)
    assert out["cls"]["w"].shape == (QCFG.fpn_dim, QCFG.num_classes + 1)
    assert not np.allclose(np.asarray(out["cls"]["w"]),
                           np.asarray(params["cls"]["w"]))
    # backbone untouched
    np.testing.assert_array_equal(np.asarray(out["stem"]["w"]),
                                  np.asarray(params["stem"]["w"]))


def test_one_to_many_aux_matching():
    # same crafted scenario as the Hungarian test: with aux_topk=2 every
    # valid GT supervises its 2 lowest-cost queries; the best query per GT
    # is still the obvious one, and the loss stays finite and comparable
    q, g, hm, c = 10, 4, 16, 6
    mlog = np.full((q, hm, hm), -8.0, np.float32)
    gm = np.zeros((g, hm, hm), np.float32)
    gm[0, 2:8, 2:8] = 1
    gm[1, 10:14, 10:14] = 1
    mlog[3, 2:8, 2:8] = 8.0
    mlog[7, 10:14, 10:14] = 8.0
    cls = np.zeros((q, c + 1), np.float32)
    cls[3, 1] = 6.0
    cls[7, 2] = 6.0
    gt_cls = np.array([1, 2, 0, 0], np.int32)
    valid = np.array([True, True, False, False])
    loss_h, matched_h = _set_loss_one(
        jnp.asarray(cls), jnp.asarray(mlog), jnp.asarray(gt_cls),
        jnp.asarray(valid), jnp.asarray(gm), no_obj_w=0.1, num_classes=c)
    loss_m, matched_m = _set_loss_one(
        jnp.asarray(cls), jnp.asarray(mlog), jnp.asarray(gt_cls),
        jnp.asarray(valid), jnp.asarray(gm), no_obj_w=0.1, num_classes=c,
        aux_topk=2)
    assert int(matched_m[0]) == 3 and int(matched_m[1]) == 7
    assert np.isfinite(float(loss_m))
    # the second-best queries are uniform-logit/empty-mask -> their added
    # supervision raises the per-pair average above the Hungarian loss
    assert float(loss_m) > float(loss_h)


def test_one_to_many_training_decreases():
    qcfg = dataclasses.replace(QCFG, query_aux_topk=3)
    rng = np.random.default_rng(1)
    imgs, gt = _gt_batch(rng, 4, 8, qcfg.image_size)
    params = DET.init_detector(jax.random.PRNGKey(1), qcfg)
    import optax

    opt = optax.adam(3e-4)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        (loss, _), grads = jax.value_and_grad(
            lambda p: DET.detector_loss(p, imgs, gt, qcfg),
            has_aux=True)(params)
        upd, state = opt.update(grads, state)
        return optax.apply_updates(params, upd), state, loss

    losses = [float(step(params, state)[2])]
    for _ in range(40):
        params, state, loss = step(params, state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.75


def test_query_aux_topk_guard():
    bad = dataclasses.replace(QCFG, query_aux_topk=QCFG.num_queries + 1)
    with pytest.raises(ValueError, match="query_aux_topk"):
        DET.init_detector(jax.random.PRNGKey(0), bad)
