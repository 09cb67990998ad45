"""Foundations: config, obs store schema parity, sense data model, Detections."""

import numpy as np
import pytest

from embodied_captioning_tpu import config as C
from embodied_captioning_tpu.sensor_data import (
    AgentPoseSense, BBSense, DepthSense, Intrinsics, Pose, RGBSense,
    get_class_from_modality_code, quat_from_yaw, quat_to_rotmat, rotmat_to_quat,
)
from embodied_captioning_tpu.utils.obs_store import (
    SampleLoader, SenseInfo, get_sense_info, save_obs,
)


def test_config_presets_and_overrides():
    cfg = C.load_config("tiny", overrides=["runtime.num_envs=2",
                                           "sensors.hfov_deg=90.0"])
    assert cfg.runtime.num_envs == 2
    assert cfg.sensors.hfov_deg == 90.0
    assert cfg.detector.image_size == 64
    large = C.ExperimentConfig.preset_config("large")
    # coca_ViT-L-14 dims (ref: model_configs/coca_ViT-L-14.json)
    assert large.captioner.vision.width == 1024
    assert large.captioner.vision.layers == 24
    assert large.captioner.text.width == 768
    with pytest.raises(KeyError):
        C.load_config("tiny", overrides=["nope.nope=1"])


def test_obs_schema_roundtrip(tmp_path):
    # filename schema parity (ref: sensors_utils.py:57-65)
    info = SenseInfo(str(tmp_path), "rgb", episode=3, camera_id=1, step=42)
    assert info.get_path().endswith(
        "episode_000003_step_00042_modality_rgb_id_1.npz")
    parsed = get_sense_info(info.get_path())
    assert parsed == info

    rgb = (np.random.default_rng(0).random((16, 16, 3)) * 255).astype(np.uint8)
    depth = np.random.default_rng(1).random((16, 16)).astype(np.float32)
    pose = Pose(np.array([1.0, 0.0, 2.0]), quat_from_yaw(0.3))
    obs = {
        "rgb": rgb,
        "depth": depth,
        "position": np.array(pose.to_dict(), dtype=object),
    }
    paths = save_obs(str(tmp_path), episode_id=3, observations=obs, timestamp=42)
    assert len(paths) == 3

    loader = SampleLoader(str(tmp_path))
    assert loader.episodes == [3]
    assert loader.steps(3, 0, "rgb") == [42]
    got_rgb = loader.get_sample(3, 0, "rgb", 42)
    np.testing.assert_array_equal(got_rgb.data, rgb)
    got_depth = loader.get_sample(3, 1, "depth", 42)
    np.testing.assert_allclose(got_depth.data, depth)
    # AgentPoseSense.load returns the camera pose (ref: sensor_data.py:124-137)
    got_pose = loader.get_sample(3, 2, "position", 42)
    expected_cam = pose.camera_pose()
    np.testing.assert_allclose(got_pose.data.position, expected_cam.position)


def test_quat_roundtrip_and_cam_offset():
    q = quat_from_yaw(1.1)
    R = quat_to_rotmat(q)
    q2 = rotmat_to_quat(R)
    np.testing.assert_allclose(np.abs(np.dot(q, q2)), 1.0, atol=1e-9)
    # camera offset is rotated into world frame (ref: sensor_data.py:108-122)
    pose = Pose(np.zeros(3), quat_from_yaw(0.0))
    cam = pose.camera_pose()
    np.testing.assert_allclose(cam.position, [0.0, 0.88, 0.0])


def test_intrinsics_from_hfov():
    # fx = W/2 / tan(hfov/2) (ref: projection_utils.py:254-270)
    intr = Intrinsics.from_hfov(256, 256, 90.0)
    np.testing.assert_allclose(intr.fx, 128.0, rtol=1e-6)
    np.testing.assert_allclose(intr.xc, 127.5)
    mat = intr.matrix()
    assert mat.shape == (3, 3) and mat[2, 2] == 1.0


def test_bbsense_classes():
    assert BBSense.CLASSES[57] == "couch"
    assert BBSense.CLASSES_TO_IDX[62] == 5
    assert get_class_from_modality_code("bbsgt") is BBSense
    assert get_class_from_modality_code("depth") is DepthSense
    assert get_class_from_modality_code("rgb") is RGBSense
    assert get_class_from_modality_code("position") is AgentPoseSense


def test_detections_container():
    import jax
    import jax.numpy as jnp

    from embodied_captioning_tpu.ops.detections import (
        Detections, boxes_from_masks, expand_boxes, pairwise_iou,
    )

    det = Detections.empty(8, mask_size=4, embed_dim=16)
    assert det.capacity == 8
    assert int(det.count()) == 0
    # pytree-ness: jit a function over it
    f = jax.jit(lambda d: d.replace(scores=d.scores + 1.0))
    out = f(det)
    assert float(out.scores[0]) == 1.0

    masks = jnp.zeros((2, 8, 8)).at[0, 2:5, 1:7].set(1.0)
    boxes = boxes_from_masks(masks, jnp.array([True, True]))
    np.testing.assert_allclose(np.asarray(boxes[0]), [1, 2, 7, 5])
    np.testing.assert_allclose(np.asarray(boxes[1]), [0, 0, 0, 0])

    a = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.array([[0.0, 0.0, 10.0, 10.0], [5.0, 5.0, 15.0, 15.0]])
    iou = pairwise_iou(a, b)
    np.testing.assert_allclose(np.asarray(iou[0, 0]), 1.0)
    np.testing.assert_allclose(np.asarray(iou[0, 1]), 25.0 / 175.0, rtol=1e-6)

    eb = expand_boxes(jnp.array([[10.0, 10.0, 20.0, 20.0]]), 0.2, 64, 64)
    np.testing.assert_allclose(np.asarray(eb[0]), [8, 8, 22, 22])

    # roundtrip through numpy dict (bbs npz payload)
    d = det.to_numpy_dict()
    det2 = Detections.from_numpy_dict(d)
    assert det2.capacity == 8
