"""Scan-fused device loop (envs/device_loop.py): parity with the host sim
step, and the fused rollouts' semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from embodied_captioning_tpu.config import load_config
from embodied_captioning_tpu.envs import device_loop as DL
from embodied_captioning_tpu.envs.sim import RaycastSim


@pytest.fixture(scope="module")
def cfg():
    return load_config("tiny", overrides=[
        "sensors.height=64", "sensors.width=64", "sim.num_objects=6",
        "sim.scene_size=8.0", "map.voxel_size=0.2",
        "runtime.caption_slots_per_frame=2",
    ])


def test_step_agents_matches_host_sim(cfg):
    """Device step_agents + camera_poses reproduce RaycastSim.step /
    AgentState.camera_matrix over a long mixed-action trajectory,
    including collision rejections."""
    sims = [RaycastSim(cfg.sim, cfg.sensors, seed=s) for s in (3, 7)]
    scenes, state = DL.states_from_sims(sims)
    rng = np.random.default_rng(0)
    actions = rng.integers(0, 4, size=(60, len(sims))).astype(np.int32)
    step = jax.jit(DL.step_agents, static_argnames=("sim_cfg",))
    for k in range(actions.shape[0]):
        host_hit = [sim.step(int(a)) for sim, a in zip(sims, actions[k])]
        state = step(scenes, state, jnp.asarray(actions[k]), cfg.sim)
        np.testing.assert_allclose(
            np.asarray(state.x), [s.agent.x for s in sims], atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(state.z), [s.agent.z for s in sims], atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(state.yaw), [s.agent.yaw for s in sims], atol=1e-4)
        assert np.asarray(state.collided).tolist() == host_hit
    poses = np.asarray(DL.camera_poses(state))
    for i, sim in enumerate(sims):
        np.testing.assert_allclose(poses[i], sim.agent.camera_matrix(),
                                   atol=1e-5)


def test_rollout_perception_smoke(cfg):
    from embodied_captioning_tpu.perception import init_perception

    sims = [RaycastSim(cfg.sim, cfg.sensors, seed=s) for s in (1, 2)]
    scenes, state = DL.states_from_sims(sims)
    params = init_perception(jax.random.PRNGKey(0), cfg)
    actions = jnp.asarray(DL.make_action_plan(3, 2))
    x0 = np.asarray(state.x).copy()
    state2, cs, nval = DL.rollout_perception(
        params, scenes, state, actions, jax.random.PRNGKey(1), cfg)
    assert np.isfinite(float(cs))
    assert int(nval) >= 0
    # agents moved (action plan is forward-biased; at least one env moves)
    assert np.any(np.abs(np.asarray(state2.x) - x0) > 1e-6)


def test_rollout_fused_matches_unfused_env_loop(cfg):
    """The scan-fused full loop produces the SAME per-step disagreement
    rewards as the unfused host loop (env.step_state -> observe ->
    perceive -> update_pointcloud -> get_reward) given the same actions
    and rng sequence — the fusion is a scheduling change, not a semantic
    one."""
    from embodied_captioning_tpu.envs.env import EmbodiedEnv
    from embodied_captioning_tpu.mapping import voxel_map as V
    from embodied_captioning_tpu.perception import init_perception, perceive

    params = init_perception(jax.random.PRNGKey(0), cfg)
    K = 4
    actions = DL.make_action_plan(K, 1, pattern="random", seed=5)

    # --- unfused host loop (one env) ---
    env = EmbodiedEnv(cfg, env_id=0, seed=11)
    key = jax.random.PRNGKey(2)
    host_rewards = []
    for k in range(K):
        env.step_state(int(actions[k, 0]))
        obs = env.observe()
        key, sub = jax.random.split(key)
        r = perceive(params, jnp.asarray(obs["rgb"])[None], sub, cfg)
        det = jax.tree_util.tree_map(lambda x: x[0], r.detections)
        env.update_pointcloud(
            det, depth=obs["depth"],
            pose=jnp.asarray(env.sim.agent.camera_matrix(), jnp.float32))
        host_rewards.append(env.get_reward())

    # --- scan-fused device loop (same env seed/scene/map) ---
    env2 = EmbodiedEnv(cfg, env_id=0, seed=11)
    scenes, state = DL.states_from_sims([env2.sim])
    maps = jax.tree_util.tree_map(lambda x: x[None], env2.map_state)
    _, maps2, rewards, collided = DL.rollout_fused(
        params, scenes, state, maps, jnp.asarray(actions),
        jax.random.PRNGKey(2), cfg)
    np.testing.assert_allclose(np.asarray(rewards)[:, 0],
                               np.asarray(host_rewards), rtol=1e-4,
                               atol=1e-5)
