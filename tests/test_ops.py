"""Kernel-level parity tests: geometry, image ops, NMS, cosine, consensus."""

import numpy as np
import jax.numpy as jnp
import pytest

from embodied_captioning_tpu.ops import geometry as G
from embodied_captioning_tpu.ops import image as I
from embodied_captioning_tpu.ops.cosine import (
    cosine_disagreement, cosine_similarity_matrix,
)
from embodied_captioning_tpu.ops.nms import class_aware_nms_topk, nms_mask, nms_topk
from embodied_captioning_tpu.mapping.consensus import resolve_rows


# ---------------------------------------------------------------------------
# geometry
# ---------------------------------------------------------------------------

def test_backproject_reproject_roundtrip(rng):
    h = w = 32
    depth = jnp.asarray(1.0 + rng.random((h, w)) * 3.0, jnp.float32)
    # camera at (1, 0.88, 2) yawed 0.7
    from embodied_captioning_tpu.sensor_data import Pose, quat_from_yaw

    pose = jnp.asarray(Pose(np.array([1.0, 0.88, 2.0]),
                            quat_from_yaw(0.7)).matrix(), jnp.float32)
    pts, valid = G.backproject_depth(depth, pose, hfov_deg=79.0,
                                     min_depth=0.5, max_depth=15.0)
    assert bool(valid.all())
    pix, in_front = G.project_points_to_image(pts, pose, h, w, 79.0)
    assert bool(in_front.all())
    ys, xs = np.mgrid[0:h, 0:w]
    # float32 through two 4x4 transforms: sub-pixel agreement is the contract
    np.testing.assert_allclose(np.asarray(pix[..., 0]), xs, atol=0.3)
    np.testing.assert_allclose(np.asarray(pix[..., 1]), ys, atol=0.3)


def test_backproject_matches_reference_math():
    """Center pixel at depth d must land d meters in front of the camera
    (-Z), offset by the camera position (ref: _project_batch_masks math)."""
    h = w = 17
    depth = jnp.full((h, w), 2.0)
    pose = jnp.eye(4)
    pts, _ = G.backproject_depth(depth, pose, hfov_deg=90.0)
    c = np.asarray(pts[h // 2, w // 2])
    np.testing.assert_allclose(c, [0.0, 0.0, -2.0], atol=1e-6)


def test_depth_outlier_mask():
    depth = jnp.asarray(np.array([[1.0, 1.0, 1.0, 50.0]]), jnp.float32)
    mask = jnp.ones((1, 4), bool)
    out = G.depth_outlier_mask(depth, mask)
    assert bool(out[0, 0]) and not bool(out[0, 3])


def test_erode_dilate():
    m = jnp.zeros((9, 9), bool).at[3:6, 3:6].set(True)
    er = G.erode_mask(m, 3)
    assert int(er.sum()) == 1 and bool(er[4, 4])
    di = G.dilate_mask(er, 3)
    assert int(di.sum()) == 9


# ---------------------------------------------------------------------------
# image
# ---------------------------------------------------------------------------

def test_resize_bilinear_constant_and_identity(rng):
    img = jnp.full((8, 8, 3), 0.5)
    out = I.resize_bilinear(img, 16, 16)
    np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-6)
    x = jnp.asarray(rng.random((8, 8, 3)), jnp.float32)
    np.testing.assert_allclose(np.asarray(I.resize_bilinear(x, 8, 8)),
                               np.asarray(x), atol=1e-6)


def test_patchify_shapes(rng):
    img = jnp.asarray(rng.random((2, 16, 16, 3)), jnp.float32)
    tokens = I.patchify(img, 8)
    assert tokens.shape == (2, 4, 192)
    # first patch equals manual slice flatten
    manual = np.asarray(img[0, :8, :8, :]).reshape(-1)
    np.testing.assert_allclose(np.asarray(tokens[0, 0]), manual)


def test_crop_and_resize_full_image_identity(rng):
    img = jnp.asarray(rng.random((16, 16, 3)), jnp.float32)
    boxes = jnp.asarray([[0.0, 0.0, 16.0, 16.0]])
    out = I.crop_and_resize(img, boxes, 16)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(img), atol=1e-5)


def test_crop_and_resize_subbox():
    img = jnp.zeros((16, 16, 1)).at[4:8, 4:8, :].set(1.0)
    out = I.crop_and_resize(img, jnp.asarray([[4.0, 4.0, 8.0, 8.0]]), 4)
    np.testing.assert_allclose(np.asarray(out[0, 1:3, 1:3, 0]), 1.0, atol=1e-5)


def test_roi_align_avg_pool():
    img = jnp.ones((8, 8, 2))
    out = I.roi_align(img, jnp.asarray([[0.0, 0.0, 8.0, 8.0]]), 4)
    assert out.shape == (1, 4, 4, 2)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-5)


def test_roi_align_fold_matches_fine_grid(rng):
    # the bin-average is folded into the interpolation weights; must equal
    # the explicit fine-sample-grid + pool formulation (linearity)
    feat = jnp.asarray(rng.random((32, 32, 8)), jnp.float32)
    boxes = jnp.asarray([[2.0, 3.0, 20.0, 17.0],
                         [0.0, 0.0, 31.0, 31.0],
                         [5.5, 6.5, 9.0, 28.0]])
    got = I.roi_align(feat, boxes, 7, sampling_ratio=2)
    fine = I.crop_and_resize(feat, boxes, 14)
    ref = fine.reshape(3, 7, 2, 7, 2, 8).mean(axis=(2, 4))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_paste_masks():
    probs = jnp.ones((1, 4, 4))  # caller sigmoids logits first
    boxes = jnp.asarray([[4.0, 4.0, 12.0, 12.0]])
    out = I.paste_masks(probs, boxes, 16, 16)
    assert out.shape == (1, 16, 16)
    assert float(out[0, 8, 8]) > 0.99
    assert float(out[0, 0, 0]) == 0.0
    assert float(out[0, 14, 14]) == 0.0


# ---------------------------------------------------------------------------
# NMS
# ---------------------------------------------------------------------------

def _boxes():
    return jnp.asarray([
        [0, 0, 10, 10],
        [1, 1, 11, 11],   # heavy overlap with 0
        [20, 20, 30, 30],
        [21, 21, 31, 31],  # heavy overlap with 2
        [50, 50, 60, 60],
    ], jnp.float32)


def test_nms_mask_greedy():
    scores = jnp.asarray([0.9, 0.8, 0.95, 0.5, 0.3])
    keep = np.asarray(nms_mask(_boxes(), scores, 0.5))
    np.testing.assert_array_equal(keep, [True, False, True, False, True])


def test_nms_topk_order_and_validity():
    scores = jnp.asarray([0.9, 0.8, 0.95, 0.5, 0.3])
    idx, ok = nms_topk(_boxes(), scores, 0.5, max_out=4)
    idx, ok = np.asarray(idx), np.asarray(ok)
    assert list(idx[ok]) == [2, 0, 4]
    assert ok.sum() == 3


def test_class_aware_nms():
    boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8])
    # same class: one survives
    idx, ok = class_aware_nms_topk(boxes, scores, jnp.asarray([0, 0]), 0.5, 2)
    assert np.asarray(ok).sum() == 1
    # different classes: both survive
    idx, ok = class_aware_nms_topk(boxes, scores, jnp.asarray([0, 1]), 0.5, 2)
    assert np.asarray(ok).sum() == 2


# ---------------------------------------------------------------------------
# cosine disagreement
# ---------------------------------------------------------------------------

def _ref_cosine_distance(mat):
    """Reference math (projection_utils.py:928-942): mat is [D, K]."""
    if mat.shape[1] == 1:
        return 0.0
    norm = np.sqrt((mat * mat).sum(0, keepdims=True))
    return float((1 - (mat.T @ mat) / norm / norm.T).mean())


def test_cosine_disagreement_matches_reference(rng):
    k, d = 5, 16
    embs = rng.standard_normal((k, d)).astype(np.float32)
    buf = np.zeros((1, 8, d), np.float32)
    buf[0, :k] = embs
    ours = float(cosine_disagreement(jnp.asarray(buf), jnp.asarray([k]))[0])
    ref = _ref_cosine_distance(embs.T)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
    # single view -> exactly 0 (ref :936-937)
    assert float(cosine_disagreement(jnp.asarray(buf), jnp.asarray([1]))[0]) == 0.0
    # identical views -> 0
    buf2 = np.tile(embs[:1], (1, 8, 1)).reshape(1, 8, d)
    val = float(cosine_disagreement(jnp.asarray(buf2), jnp.asarray([4]))[0])
    np.testing.assert_allclose(val, 0.0, atol=1e-6)


def test_cosine_similarity_matrix(rng):
    a = rng.standard_normal((3, 8)).astype(np.float32)
    sim = np.asarray(cosine_similarity_matrix(jnp.asarray(a), jnp.asarray(a)))
    np.testing.assert_allclose(np.diag(sim), 1.0, atol=1e-4)


# ---------------------------------------------------------------------------
# consensus strategies (parity with inconsistencies.py)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("solution", ["seal", "bayesian", "ours", "avg", "max"])
def test_consensus_strategies(solution, rng):
    rows = rng.standard_normal((4, 6)).astype(np.float32)
    valid = np.ones((4,), bool)
    cls, logits = resolve_rows(jnp.asarray(rows), jnp.asarray(valid), solution)
    cls = int(cls)
    if solution in ("seal", "ours", "max"):
        assert cls == int(rows.max(0).argmax())
    if solution == "avg":
        assert cls == int(rows.mean(0).argmax())
    if solution == "bayesian":
        lse = np.log(np.exp(rows).sum(0))
        expected = (lse / lse.sum()).argmax()
        assert cls == int(expected)
    if solution in ("ours", "avg"):
        np.testing.assert_allclose(np.asarray(logits), rows.mean(0), rtol=1e-5)


def test_consensus_empty():
    cls, logits = resolve_rows(jnp.zeros((3, 6)), jnp.zeros((3,), bool), "max")
    assert int(cls) == -1
    np.testing.assert_allclose(np.asarray(logits), 0.0)
