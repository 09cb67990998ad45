"""Caption dataset forms (images dir + crop CSV) and the Viz replay env."""

import csv
import json

import numpy as np

from embodied_captioning_tpu.labeling.caption_datasets import (
    CaptioningBaseDataset, DetectionCropDataset,
)
from embodied_captioning_tpu.models.tokenizer import default_tokenizer


def test_images_dir_dataset(tmp_path):
    for i in range(3):
        np.savez(tmp_path / f"img{i}.npz",
                 (np.random.default_rng(i).random((16, 16, 3)) * 255
                  ).astype(np.uint8))
    with open(tmp_path / "captions.csv", "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=["image", "caption"])
        w.writeheader()
        for i in range(2):
            w.writerow({"image": f"img{i}.npz", "caption": f"cap {i}"})
    ds = CaptioningBaseDataset(str(tmp_path))
    assert len(ds) == 2  # img2 has no caption
    img, cap = ds[0]
    assert img.shape == (16, 16, 3) and cap == "cap 0"


def test_crop_csv_dataset(tmp_path):
    np.savez(tmp_path / "scene.npz",
             (np.random.default_rng(0).random((32, 32, 3)) * 255
              ).astype(np.uint8))
    with open(tmp_path / "crops.csv", "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=["image", "x1", "y1", "x2", "y2",
                                           "caption", "object_id"])
        w.writeheader()
        for i in range(4):
            w.writerow({"image": "scene.npz", "x1": 2, "y1": 2, "x2": 20,
                        "y2": 20, "caption": "a red couch", "object_id": i})
    ds = DetectionCropDataset(str(tmp_path / "crops.csv"), crop_size=16)
    assert len(ds) == 4
    crop, cap, oid = ds[1]
    assert crop.shape == (16, 16, 3) and oid == 1
    tok = default_tokenizer()
    batch = next(ds.batches(tok, 24, 2))
    assert batch["image"].shape == (2, 16, 16, 3)
    assert batch["tokens"].shape == (2, 24)


def test_viz_env_replays_store(tmp_path):
    from embodied_captioning_tpu.config import load_config
    from embodied_captioning_tpu.envs.registry import make_env
    from embodied_captioning_tpu.utils.obs_store import save_obs

    rng = np.random.default_rng(0)
    for step in range(3):
        save_obs(str(tmp_path), 0, {
            "rgb": (rng.random((24, 24, 3)) * 255).astype(np.uint8),
            "depth": rng.random((24, 24)).astype(np.float32),
        }, step)
    cfg = load_config("tiny", overrides=[
        f"sim.replay_dir={tmp_path}", "sensors.height=24",
        "sensors.width=24", "sim.scene_size=6.0", "sim.num_objects=2",
        "map.voxel_size=0.2"])
    env = make_env("Viz-v0", cfg)
    obs = env.observe()
    assert tuple(obs["rgb"].shape) == (24, 24, 3)
    steps = 0
    done = False
    while not done and steps < 10:
        obs, _, done, info = env.step(1)
        steps += 1
    assert done and steps == 3


def test_viz_v1_trajectory_env(tmp_path):
    """Viz-v1 (ref VizSEAL): replays frames, attaches the class-normalized
    topdown semantic map as obs['pcd'], tracks recorded positions, and
    writes per-step trajectory PNGs."""
    import glob

    from embodied_captioning_tpu.config import load_config
    from embodied_captioning_tpu.envs.registry import make_env
    from embodied_captioning_tpu.utils.obs_store import save_obs

    rng = np.random.default_rng(1)
    obs_dir = tmp_path / "obs"
    for step in range(3):
        save_obs(str(obs_dir), 0, {
            "rgb": (rng.random((24, 24, 3)) * 255).astype(np.uint8),
            "depth": rng.random((24, 24)).astype(np.float32),
            "position": {"position": np.asarray([1.0 + step, 0.0, 2.0]),
                         "orientation": np.asarray([1.0, 0.0, 0.0, 0.0])},
        }, step)
    viz_dir = tmp_path / "out"
    cfg = load_config("tiny", overrides=[
        f"sim.replay_dir={obs_dir}", f"runtime.obs_dir={viz_dir}",
        "sensors.height=24", "sensors.width=24", "sim.scene_size=6.0",
        "sim.num_objects=2", "map.voxel_size=0.2"])
    env = make_env("Viz-v1", cfg)
    obs = env.reset()
    assert obs["pcd"].shape == tuple(
        [cfg.map.grid[2], cfg.map.grid[0]])
    assert float(np.max(obs["pcd"])) <= 1.0
    done = False
    while not done:
        obs, _, done, _ = env.step(1)
    pngs = sorted(glob.glob(str(viz_dir / "viz" / "trajectory_*.png")))
    assert len(pngs) >= 3
    raw = open(pngs[-1], "rb").read()
    assert raw[:8] == b"\x89PNG\r\n\x1a\n" and b"IEND" in raw
    assert len(env._traj_cells) >= 3
