"""Trainer registry breadth: every registered trainer constructs and steps a
few env steps (perception disabled for speed; the perception path is covered
by the e2e run_exp drive and test_agents)."""

import numpy as np
import pytest

from embodied_captioning_tpu.agents import get_trainer, list_trainers
from embodied_captioning_tpu.config import load_config

CFG = load_config("tiny", overrides=[
    "runtime.num_envs=1", "sensors.height=48", "sensors.width=48",
    "sim.scene_size=6.0", "sim.num_objects=4", "sim.episode_steps=6",
    "map.voxel_size=0.1", "ppo.replanning_steps=3",
])

LIGHT_TRAINERS = [
    "randombaseline", "rotatebaseline", "bouncebaseline",
    "randomgoalsbaseline", "frontierbaseline-v1", "frontierbaseline-v2",
    "frontierbaseline-v3", "curiosity-v0", "observeobjectbaseline",
    "observeobjectdiscreteactionsbaseline",
]


def test_registry_has_reference_names():
    names = set(list_trainers())
    for expected in ["goalexplorationbaseline-v0", "goalexplorationbaseline-v1",
                     "goalexplorationbaseline-v2", "frontierbaseline-v1",
                     "randomgoalsbaseline", "myppo", "curiosity-v0",
                     "informative-trajectories-v0",
                     "randomgoalsbaselinecaptioner"]:
        assert expected in names, expected


@pytest.mark.parametrize("name", LIGHT_TRAINERS)
def test_trainer_steps(name):
    tr = get_trainer(name)(CFG, with_perception=False)
    obs = tr.envs.observe()
    for _ in range(3):
        acts = tr.actions(obs)
        assert len(acts) == 1 and all(0 <= a <= 3 for a in acts)
        obs, _, _, _ = tr.envs.step(acts)


def test_goalexploration_generate_without_perception():
    tr = get_trainer("goalexplorationbaseline-v0")(CFG,
                                                   with_perception=False)
    tr.generate(4)
    assert tr._step == 4


def test_goalexploration_v3_image_history():
    """v3 stacks the last 4 map frames channel-wise
    (ref: goal_exploration_trajectory_images.py:25-55)."""
    tr = get_trainer("goalexplorationbaseline-v3")(CFG,
                                                   with_perception=False)
    assert tr.pcfg.input_channels == 8  # 4 frames x 2 channels
    maps, orients = tr._policy_obs()
    assert maps.shape[-1] == 8
    first = maps[..., :2].copy()
    maps2, _ = tr._policy_obs()
    # history shifted: frame 0 of the new stack == frame 1 of the old
    np.testing.assert_allclose(maps2[..., 4:6], maps[..., 6:8])
    tr.generate(4)
    assert tr._step == 4


def test_goalexploration_recurrent_gru_train():
    """Recurrent policy path: GRU state threads through decisions and PPO
    re-evaluates against the stored pre-step states
    (ref: utils/model.py NNBase GRU + recurrent storage)."""
    cfg = load_config("tiny", overrides=[
        "runtime.num_envs=2", "sensors.height=48", "sensors.width=48",
        "sim.scene_size=6.0", "sim.num_objects=4", "map.voxel_size=0.1",
        "ppo.num_global_steps=2", "ppo.ppo_epoch=1", "ppo.num_mini_batch=2",
        "policy.recurrent=true", "policy.map_size=32",
    ])
    tr = get_trainer("goalexplorationbaseline-v0")(cfg,
                                                   with_perception=False)
    assert tr._rnn is not None and tr._rnn.shape == (2, tr.RNN_DIM)
    before = tr._rnn.copy()
    metrics = tr.train(num_updates=1, decisions_per_update=2)
    assert len(metrics) == 1 and np.isfinite(metrics[0]["loss"])
    assert not np.allclose(tr._rnn, before)  # GRU state advanced


def test_goalexploration_fused_train():
    """Scan-fused PPO training windows (BaseTrainer.fused_window): one
    device launch per num_global_steps window, host sims shadow-stepped for
    the action plan and re-synced from the device pose after."""
    cfg = load_config("tiny", overrides=[
        "runtime.num_envs=2", "sensors.height=48", "sensors.width=48",
        "sim.scene_size=6.0", "sim.num_objects=4", "sim.episode_steps=8",
        "map.voxel_size=0.1", "ppo.num_global_steps=2", "ppo.ppo_epoch=1",
        "ppo.num_mini_batch=2", "runtime.caption_slots_per_frame=2",
        "detector.score_threshold=0.2",
    ])
    tr = get_trainer("goalexplorationbaseline-v0")(cfg)
    metrics = tr.train(num_updates=1, decisions_per_update=2, fused=True)
    assert len(metrics) == 1 and np.isfinite(metrics[0]["loss"])
    assert tr._step == 4  # 1 update x 2 decisions x window 2
    # host shadow == device pose after the window (synced back)
    for env in tr.envs.envs:
        assert np.isfinite(env.sim.agent.x) and np.isfinite(env.sim.agent.z)
    # a second update crosses the episode boundary (step 8) exactly at a
    # window edge: envs reset and training continues
    metrics = tr.train(num_updates=1, decisions_per_update=2, fused=True)
    assert np.isfinite(metrics[-1]["loss"])


def test_env_registry():
    from embodied_captioning_tpu.envs.registry import ENV_REGISTRY, make_env

    for expected in ["Habitat3Env", "GymHabitatEnv-v2",
                     "SemanticDisagreement-v0", "SemanticDisagreement-kl",
                     "Viz-v0", "Viz-v1"]:
        assert expected in ENV_REGISTRY, expected
    env = make_env("SemanticDisagreement-v0", CFG)
    obs, r, done, info = env.step(1)
    assert "area_ratio" in info and 0 <= info["area_ratio"] <= 1.5
    with pytest.raises(KeyError):
        make_env("nope", CFG)
