"""Aux subsystems: sensors, profiling, checkpointing, logging,
teacher-student pipeline mechanics."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from embodied_captioning_tpu.config import load_config

CFG = load_config("tiny", overrides=[
    "runtime.num_envs=1", "sensors.height=48", "sensors.width=48",
    "sim.scene_size=6.0", "sim.num_objects=4", "sim.episode_steps=5",
    "map.voxel_size=0.1",
])


@pytest.fixture(scope="module")
def env():
    from embodied_captioning_tpu.envs.env import EmbodiedEnv

    return EmbodiedEnv(CFG, env_id=0)


def test_sensor_registry(env):
    from embodied_captioning_tpu.envs import sensors as S

    obs = env.observe()
    for name in ("object_detector_gt", "position_sensor_origin",
                 "position_sensor", "position_sensor_pixels",
                 "noisy_position_sensor", "agent_collision_sensor",
                 "movement_sensor", "proximity_sensor", "gt_ego_map",
                 "map_sensor", "semantic_instances",
                 "object_detector_gt_discard_occlusions"):
        out = S.get_sensor(name)(env, obs)
        assert out is not None, name

    ego = S.get_sensor("gt_ego_map")(env, obs)
    assert ego.shape == (64, 64, 2)
    assert ego[..., 1].sum() >= ego[..., 0].sum()  # explored ⊇ obstacles
    prox = S.get_sensor("proximity_sensor")(env, obs)
    assert 0 < prox <= 2.0
    noisy = S.get_sensor("noisy_position_sensor")(env, obs)
    clean = S.get_sensor("position_sensor_origin")(env, obs)
    assert not np.allclose(noisy["position"], clean["position"])
    si = S.get_sensor("semantic_instances")(env, obs)
    assert "mapping" in si


def test_profiling_ranges():
    from embodied_captioning_tpu.utils.profiling import RangeTimer

    t = RangeTimer()
    with t.range("a"):
        with t.range("b"):
            pass
    t.range_push("c")
    t.range_pop()
    s = t.summary()
    assert set(s) == {"a", "b", "c"}
    assert s["a"]["count"] == 1


def test_metrics_logger(tmp_path):
    from embodied_captioning_tpu.utils.logging import MetricsLogger

    ml = MetricsLogger(str(tmp_path), run_name="t")
    ml.log({"loss": 1.0})
    ml.log({"loss": 0.5}, step=10)
    ml.close()
    lines = open(os.path.join(tmp_path, "t.jsonl")).read().splitlines()
    assert len(lines) == 2 and '"step": 10' in lines[1]


def test_orbax_checkpoint_roundtrip(tmp_path):
    from embodied_captioning_tpu.utils.checkpoint import CheckpointManager

    state = {"w": jnp.arange(4.0), "n": jnp.asarray(3)}
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(1, state, metadata={"note": "hi"})
    assert mgr.latest_step() == 1
    template = {"w": jnp.zeros(4), "n": jnp.asarray(0)}
    restored = mgr.restore(template)
    np.testing.assert_allclose(np.asarray(restored["w"]),
                               np.asarray(state["w"]))
    # saved metadata must survive the round trip
    restored2, meta = mgr.restore(template, with_metadata=True)
    assert meta == {"note": "hi"}
    np.testing.assert_allclose(np.asarray(restored2["w"]),
                               np.asarray(state["w"]))
    mgr.close()


def test_sensor_caches_reset_per_episode():
    """position_sensor's episode-start anchor and movement_sensor's
    previous position must not leak across env.reset() (new episode = new
    random spawn; a stale anchor mis-references every later reading)."""
    from embodied_captioning_tpu.envs import sensors as S
    from embodied_captioning_tpu.envs.env import EmbodiedEnv

    env = EmbodiedEnv(CFG, env_id=3)
    obs = env.observe()
    rel1 = S.get_sensor("position_sensor")(env, obs)
    np.testing.assert_allclose(rel1["position"], 0.0, atol=1e-9)
    S.get_sensor("movement_sensor")(env, obs)
    env.step(1)
    obs = env.reset()
    rel2 = S.get_sensor("position_sensor")(env, obs)
    np.testing.assert_allclose(rel2["position"], 0.0, atol=1e-9)
    mv = S.get_sensor("movement_sensor")(env, obs)
    np.testing.assert_allclose(mv, 0.0, atol=1e-9)


def test_preemption_guard():
    from embodied_captioning_tpu.utils.checkpoint import PreemptionGuard

    calls = []
    g = PreemptionGuard(on_exit=lambda: calls.append(1))
    g.install()
    g.should_exit = True
    g.finalize()
    assert calls == [1]


def test_ema_and_swa():
    from embodied_captioning_tpu.train.pipelines import ema_update, swa_average

    t = {"w": jnp.ones(3)}
    s = {"w": jnp.zeros(3)}
    out = ema_update(t, s, decay=0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.9)
    avg = swa_average([{"w": jnp.ones(2)}, {"w": jnp.zeros(2)}])
    np.testing.assert_allclose(np.asarray(avg["w"]), 0.5)


def test_triplet_loss():
    from embodied_captioning_tpu.train.captioner_train import triplet_loss_hard

    emb = jnp.asarray([[1.0, 0.0], [0.9, 0.1], [0.0, 1.0], [0.1, 0.9]])
    ids = jnp.asarray([1, 1, 2, 2])
    valid = jnp.ones(4, bool)
    loss_good = float(triplet_loss_hard(emb, ids, valid, margin=0.2))
    # clustered embeddings -> near-zero hinge
    assert loss_good < 0.1
    bad = jnp.asarray([[1.0, 0.0], [0.0, 1.0], [0.95, 0.05], [0.1, 0.9]])
    loss_bad = float(triplet_loss_hard(bad, ids, valid, margin=0.2))
    assert loss_bad > loss_good
    # no valid triplets -> 0
    assert float(triplet_loss_hard(emb, jnp.asarray([1, 2, 3, 4]), valid)) \
        == 0.0
