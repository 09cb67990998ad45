"""Distributed PPO trainer: sharded update on the 8-device virtual mesh."""

import numpy as np

from embodied_captioning_tpu.agents import get_trainer
from embodied_captioning_tpu.config import load_config


def test_myppo_sharded_update(tmp_path):
    cfg = load_config("tiny", overrides=[
        "runtime.num_envs=8", "sensors.height=32", "sensors.width=32",
        "sim.scene_size=6.0", "sim.num_objects=3", "sim.episode_steps=64",
        "map.voxel_size=0.2", "ppo.num_global_steps=1",
        "ppo.num_mini_batch=1", "ppo.ppo_epoch=1",
        f"runtime.checkpoint_dir={tmp_path}",
    ])
    tr = get_trainer("myppo")(cfg, with_perception=False)
    assert dict(tr.mesh.shape) == {"data": 8}
    metrics = tr.train(num_updates=1, decisions_per_update=2)
    assert len(metrics) == 1
    assert np.isfinite(metrics[0]["loss"])
    # resume state written
    assert tr.ckpt_mgr.latest_step() is not None
    # a fresh trainer resumes from the checkpoint
    tr2 = get_trainer("myppo")(cfg, with_perception=False)
    assert tr2._update_idx == tr._update_idx
