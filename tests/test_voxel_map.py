"""Semantic voxel map: integrate → disagree → topdown → raytrace → KL."""

import numpy as np
import jax.numpy as jnp

from embodied_captioning_tpu.config import MapConfig
from embodied_captioning_tpu.mapping import voxel_map as V
from embodied_captioning_tpu.mapping.components import (
    connected_components_26, resegment_objects,
)
from embodied_captioning_tpu.sensor_data import Pose, quat_from_yaw

CFG = MapConfig(grid=(48, 16, 48), max_objects=16, max_views_per_object=4,
                voxel_size=0.1, height_thresh=(0.2, 1.4))
HFOV = 90.0


def _frame(rng, obj_col=16, obj_depth=2.0):
    """A synthetic frame: flat wall at 4 m with one object patch at
    `obj_depth` m occupying a square around column obj_col."""
    h = w = 32
    depth = np.full((h, w), 4.0, np.float32)
    mask = np.zeros((2, h, w), np.float32)
    mask[0, 10:22, obj_col - 6:obj_col + 6] = 1.0
    depth[10:22, obj_col - 6:obj_col + 6] = obj_depth
    classes = np.array([2, 0], np.int32)
    logits = np.zeros((2, 6), np.float32)
    logits[0, 2] = 5.0
    emb = rng.standard_normal((2, 384)).astype(np.float32)
    valid = np.array([True, False])
    return (jnp.asarray(depth), jnp.asarray(mask), jnp.asarray(classes),
            jnp.asarray(logits), jnp.asarray(emb), jnp.asarray(valid))


def _pose(x=2.4, z=4.5, yaw=0.0):
    return jnp.asarray(Pose(np.array([x, 0.0, z]),
                            quat_from_yaw(yaw)).camera_pose().matrix(),
                       jnp.float32)


def test_integrate_creates_object(rng):
    state = V.create(CFG, lower_bound=[0.0, 0.0, 0.0])
    depth, mask, classes, logits, emb, valid = _frame(rng)
    state = V.integrate_frame(state, depth, _pose(), mask, classes, logits,
                              emb, valid, CFG, hfov_deg=HFOV, max_depth=3.5)
    assert int(state.num_objects) == 1
    slot = int(np.argmax(np.asarray(state.obj_active)))
    assert int(state.obj_class[slot]) == 2
    assert int(state.obj_emb_cnt[slot]) == 1
    # voxels were claimed
    assert int((np.asarray(state.count) > 0).sum()) > 0
    # object centroid ~2m in front of the camera at x=2.4
    cent = np.asarray(state.obj_pos_sum[slot]) / float(state.obj_pts[slot])
    np.testing.assert_allclose(cent[0], 2.4, atol=0.5)
    np.testing.assert_allclose(cent[2], 2.5, atol=0.5)


def test_multi_view_merge_and_disagreement(rng):
    state = V.create(CFG, lower_bound=[0.0, 0.0, 0.0])
    depth, mask, classes, logits, emb, valid = _frame(rng)
    state = V.integrate_frame(state, depth, _pose(), mask, classes, logits,
                              emb, valid, CFG, hfov_deg=HFOV, max_depth=3.5)
    # second view of the same object, slightly moved camera, new embedding
    emb2 = jnp.asarray(rng.standard_normal((2, 384)).astype(np.float32))
    state = V.integrate_frame(state, depth, _pose(x=2.5), mask, classes,
                              logits, emb2, valid, CFG, hfov_deg=HFOV,
                              max_depth=3.5)
    assert int(state.num_objects) == 1  # merged by centroid matching
    slot = int(np.argmax(np.asarray(state.obj_active)))
    assert int(state.obj_emb_cnt[slot]) == 2
    dis = np.asarray(V.object_disagreement(state, CFG))
    assert dis[slot] > 0.0  # two random embeddings disagree
    # reward is positive and equals map sum * scale
    r = float(V.disagreement_reward(state, CFG, scale=1e-3))
    maps = np.asarray(V.topdown_maps(state, CFG))
    np.testing.assert_allclose(r, maps[..., 3].sum() * 1e-3, rtol=1e-5)


def test_identical_embeddings_zero_disagreement(rng):
    state = V.create(CFG, lower_bound=[0.0, 0.0, 0.0])
    depth, mask, classes, logits, emb, valid = _frame(rng)
    for dx in (0.0, 0.05, 0.1):
        state = V.integrate_frame(state, depth, _pose(x=2.4 + dx), mask,
                                  classes, logits, emb, valid, CFG,
                                  hfov_deg=HFOV, max_depth=3.5)
    dis = np.asarray(V.object_disagreement(state, CFG))
    np.testing.assert_allclose(dis.max(), 0.0, atol=1e-5)
    np.testing.assert_allclose(float(V.disagreement_reward(state, CFG)), 0.0,
                               atol=1e-6)


def test_topdown_channels(rng):
    state = V.create(CFG, lower_bound=[0.0, 0.0, 0.0])
    depth, mask, classes, logits, emb, valid = _frame(rng)
    state = V.integrate_frame(state, depth, _pose(), mask, classes, logits,
                              emb, valid, CFG, hfov_deg=HFOV, max_depth=3.5)
    maps = np.asarray(V.topdown_maps(state, CFG))
    assert maps.shape == (48, 48, 4)
    assert maps[..., 0].sum() > 0  # obstacle
    assert maps[..., 1].sum() >= maps[..., 0].sum()  # explored ⊇ obstacle
    assert maps[..., 2].max() == 3.0  # class 2 + 1


def test_raytrace_pseudo_labels(rng):
    state = V.create(CFG, lower_bound=[0.0, 0.0, 0.0])
    depth, mask, classes, logits, emb, valid = _frame(rng)
    state = V.integrate_frame(state, depth, _pose(), mask, classes, logits,
                              emb, valid, CFG, hfov_deg=HFOV, max_depth=3.5)
    masks, slots, cls, lg, v = V.raytrace_pseudo_labels(
        state, depth, _pose(), CFG, hfov_deg=HFOV, max_objects_out=4,
        min_pixels=20)
    v = np.asarray(v)
    assert v.sum() == 1
    i = int(np.argmax(v))
    assert int(cls[i]) == 2
    # raytraced mask overlaps the original (eroded) detection mask
    m = np.asarray(masks[i])
    orig = np.asarray(mask[0]) > 0.5
    inter = (m & orig).sum()
    assert inter > 0.3 * m.sum()
    # resolved logits argmax = class
    assert int(np.asarray(lg[i]).argmax()) == 2


def test_kl_score(rng):
    state = V.create(CFG, lower_bound=[0.0, 0.0, 0.0])
    depth, mask, classes, logits, emb, valid = _frame(rng)
    state = V.integrate_frame(state, depth, _pose(), mask, classes, logits,
                              emb, valid, CFG, hfov_deg=HFOV, max_depth=3.5)
    # agreeing prediction -> low KL; disagreeing -> higher
    agree = V.kl_score(state, depth, _pose(), mask, logits, valid, CFG,
                       hfov_deg=HFOV)
    wrong_logits = jnp.asarray(np.roll(np.asarray(logits), 1, axis=1))
    disagree = V.kl_score(state, depth, _pose(), mask, wrong_logits, valid,
                          CFG, hfov_deg=HFOV)
    assert float(disagree[0]) > float(agree[0])


def test_connected_components_native_and_fallback():
    grid = np.zeros((8, 8, 8), np.int32)
    grid[1:3, 1:3, 1:3] = 1
    grid[5:7, 5:7, 5:7] = 1
    grid[1:3, 5:7, 1:3] = 2
    comps, n = connected_components_26(grid)
    assert n == 3
    assert comps[1, 1, 1] != comps[5, 5, 5]
    assert comps[1, 1, 1] != comps[1, 5, 1]
    # diagonal touch merges under 26-connectivity
    g2 = np.zeros((4, 4, 4), np.int32)
    g2[0, 0, 0] = 1
    g2[1, 1, 1] = 1
    comps2, n2 = connected_components_26(g2)
    assert n2 == 1

    from embodied_captioning_tpu.mapping.components import _scipy_cc

    comps_s, n_s = _scipy_cc(grid)
    assert n_s == 3


def test_resegment_objects():
    grid = np.zeros((8, 8, 8), np.int32)
    grid[1:3, 1:3, 1:3] = 1
    vox_obj = np.full((8, 8, 8), -1, np.int64)
    vox_obj[1:3, 1:3, 1:3] = 4
    comps, obj_to_comp, n = resegment_objects(grid, vox_obj)
    assert n == 1
    assert obj_to_comp[4] == comps[1, 1, 1]


def test_id_allocator_and_matching():
    from embodied_captioning_tpu.mapping.matching import (
        IdAllocator, match_ids_iou, unique_ids,
    )
    from embodied_captioning_tpu.ops.detections import Detections

    pred = Detections.empty(4)
    pred = pred.replace(
        boxes=jnp.asarray([[0, 0, 10, 10], [20, 20, 30, 30],
                           [0, 0, 0, 0], [0, 0, 0, 0]], jnp.float32),
        valid=jnp.asarray([True, True, False, False]))
    gt = Detections.empty(2)
    gt = gt.replace(
        boxes=jnp.asarray([[1, 1, 11, 11], [40, 40, 50, 50]], jnp.float32),
        valid=jnp.asarray([True, True]),
        object_ids=jnp.asarray([7, 9], jnp.int32))
    alloc = IdAllocator(next_id=100)
    ids, eps = match_ids_iou(pred, gt, alloc, episode=3)
    assert ids[0] == 7       # matched by IoU
    assert ids[1] == 100     # fresh
    assert ids[2] == -1      # invalid slot untouched
    assert eps[0] == 3

    alloc2 = IdAllocator()
    uids, _ = unique_ids(pred, alloc2, episode=1)
    assert uids[0] == 5_000_000 and uids[1] == 5_000_001
