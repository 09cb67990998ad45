"""Distributed PPO trainer: sharded update on the 8-device virtual mesh,
plus the SIGTERM preemption path (guard -> early stop -> resume state ->
requeue hook -> resume at the right update index;
ref: ppo_trainer.py:672-735)."""

import os
import signal
import threading

import numpy as np

from embodied_captioning_tpu.agents import get_trainer
from embodied_captioning_tpu.config import load_config


def _tiny_cfg(tmp_path):
    return load_config("tiny", overrides=[
        "runtime.num_envs=8", "sensors.height=32", "sensors.width=32",
        "sim.scene_size=6.0", "sim.num_objects=3", "sim.episode_steps=64",
        "map.voxel_size=0.2", "ppo.num_global_steps=1",
        "ppo.num_mini_batch=1", "ppo.ppo_epoch=1",
        f"runtime.checkpoint_dir={tmp_path}",
    ])


def test_myppo_sharded_update(tmp_path):
    cfg = _tiny_cfg(tmp_path)
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


def test_myppo_sigterm_preemption_and_resume(tmp_path, monkeypatch):
    """A real SIGTERM delivered mid-train must (a) stop the loop early,
    (b) write a resume checkpoint, (c) fire the requeue hook
    (ECAP_REQUEUE_CMD), and (d) let a fresh trainer resume at the saved
    update index and keep training."""
    marker = tmp_path / "requeued.marker"
    monkeypatch.setenv("ECAP_REQUEUE_CMD", f"touch {marker}")
    cfg = _tiny_cfg(tmp_path / "ckpt")
    tr = get_trainer("myppo")(cfg, with_perception=False)

    # deliver SIGTERM shortly after training starts (handler runs in the
    # main thread between bytecodes — the guard flips should_exit and the
    # loop breaks at the next update boundary)
    pid = os.getpid()
    timer = threading.Timer(0.5, lambda: os.kill(pid, signal.SIGTERM))
    timer.start()
    try:
        metrics = tr.train(num_updates=50, decisions_per_update=2)
    finally:
        timer.cancel()
    assert tr.guard.should_exit
    assert 1 <= len(metrics) < 50  # stopped early, after >= 1 update
    # resume state written at the interrupted index; requeue hook fired
    assert tr.ckpt_mgr.latest_step() == tr._update_idx
    assert marker.exists()

    # a fresh trainer resumes at the right update index and trains on
    tr2 = get_trainer("myppo")(cfg, with_perception=False)
    assert tr2._update_idx == tr._update_idx
    more = tr2.train(num_updates=1, decisions_per_update=2)
    assert np.isfinite(more[-1]["loss"])
    assert tr2._update_idx == tr._update_idx + 1
