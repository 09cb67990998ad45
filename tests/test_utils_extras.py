"""extras (confusion matrix, depth noise, viewpoints), COCO tooling,
episode dataset."""

import json

import numpy as np

from embodied_captioning_tpu.config import NUM_CLASSES
from embodied_captioning_tpu.utils.coco import (
    coco_to_samples, detections_to_coco, evaluate_coco,
)
from embodied_captioning_tpu.utils.extras import (
    ConfusionMatrix, redwood_depth_noise, sample_object_viewpoints,
)
from embodied_captioning_tpu.envs.episodes import (
    EpisodeDataset, EpisodeSpec, apply_episode,
)


def test_confusion_matrix():
    cm = ConfusionMatrix()
    pred_b = np.array([[0, 0, 10, 10], [20, 20, 30, 30]], np.float32)
    gt_b = np.array([[1, 1, 11, 11]], np.float32)
    cm.update(pred_b, np.array([2, 3]), gt_b, np.array([2]))
    assert cm.matrix[2, 2] == 1       # true positive class 2
    assert cm.matrix[NUM_CLASSES, 3] == 1  # false positive class 3
    cm.update(np.zeros((0, 4)), np.zeros(0), gt_b, np.array([1]))
    assert cm.matrix[1, NUM_CLASSES] == 1  # miss
    assert 0 <= cm.summary()["accuracy"] <= 1


def test_depth_noise():
    rng = np.random.default_rng(0)
    d = np.full((32, 32), 3.0, np.float32)
    noisy = redwood_depth_noise(d, rng)
    assert noisy.shape == d.shape
    assert 0 < np.abs(noisy[noisy > 0] - 3.0).mean() < 0.2
    assert (noisy == 0).sum() >= 0  # dropout possible


def test_viewpoint_sampling():
    trav = np.ones((60, 60), np.uint8)
    trav[25:35, 25:35] = 0  # object footprint blocked
    vps = sample_object_viewpoints(trav, 0.1, (3.0, 3.0),
                                   radius_range=(1.0, 2.0), num_viewpoints=6)
    assert len(vps) >= 4
    for x, z, yaw in vps:
        d = np.hypot(x - 3.0, z - 3.0)
        assert 0.9 < d < 2.1
        # facing the object
        fwd = np.array([-np.sin(yaw), -np.cos(yaw)])
        to_obj = np.array([3.0 - x, 3.0 - z])
        to_obj /= np.linalg.norm(to_obj)
        assert fwd @ to_obj > 0.95


def test_coco_roundtrip(tmp_path):
    import jax.numpy as jnp

    from embodied_captioning_tpu.ops.detections import Detections

    det = Detections.empty(4)
    det = det.replace(
        boxes=jnp.asarray([[2, 2, 12, 12], [0, 0, 0, 0], [0, 0, 0, 0],
                           [0, 0, 0, 0]], jnp.float32),
        classes=jnp.asarray([1, 0, 0, 0]),
        scores=jnp.asarray([0.9, 0, 0, 0]),
        valid=jnp.asarray([True, False, False, False]))
    results = detections_to_coco([det], [7])
    assert len(results) == 1
    assert results[0]["category_id"] == 58  # local 1 -> COCO plant
    assert results[0]["bbox"] == [2.0, 2.0, 10.0, 10.0]

    coco = {
        "images": [{"id": 7, "file_name": "a.png", "width": 64,
                    "height": 64}],
        "annotations": [
            {"image_id": 7, "category_id": 58, "bbox": [2, 2, 10, 10]},
            {"image_id": 7, "category_id": 1, "bbox": [0, 0, 5, 5]},  # person: filtered
        ],
    }
    p = tmp_path / "ann.json"
    p.write_text(json.dumps(coco))
    samples = coco_to_samples(str(p))
    assert len(samples) == 1
    assert samples[0]["classes"].tolist() == [1]
    ev = evaluate_coco(results, samples)
    assert abs(ev["map"] - 1.0) < 1e-6


def test_episode_dataset_roundtrip(tmp_path):
    ds = EpisodeDataset(num_episodes=5, split="val", seed=3)
    assert len(ds) == 5
    assert ds[0].split == "val"
    # deterministic
    ds2 = EpisodeDataset(num_episodes=5, split="val", seed=3)
    assert ds[2].start_position == ds2[2].start_position
    path = tmp_path / "eps.json"
    ds.save(str(path))
    ds3 = EpisodeDataset.load(str(path))
    assert ds3[1].scene_seed == ds[1].scene_seed

    # applying an episode repositions the env deterministically
    from embodied_captioning_tpu.config import load_config
    from embodied_captioning_tpu.envs.env import EmbodiedEnv

    cfg = load_config("tiny", overrides=[
        "sensors.height=32", "sensors.width=32", "sim.scene_size=6.0",
        "sim.num_objects=3", "map.voxel_size=0.1"])
    env = EmbodiedEnv(cfg)
    spec = EpisodeSpec(episode_id=42, scene_seed=9,
                       start_position=(3.0, 3.0), start_yaw=1.0)
    apply_episode(env, spec)
    assert env.get_episode_id() == 42
    assert env.sim.agent.yaw == 1.0
