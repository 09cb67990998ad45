"""Agents: planner, policy distributions, GAE/PPO update, sim + env basics,
and a micro end-to-end exploration loop on the CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from embodied_captioning_tpu.agents.planner import astar, skeleton_waypoints
from embodied_captioning_tpu.agents.policy import (
    act, evaluate_actions, init_policy,
)
from embodied_captioning_tpu.agents.ppo import create_state, ppo_update
from embodied_captioning_tpu.agents.storage import (
    FIFOMemory, Rollout, RolloutStorage, compute_gae,
)
from embodied_captioning_tpu.config import PPOConfig, PolicyConfig, load_config


def test_astar_simple_and_blocked():
    grid = np.ones((16, 16), np.uint8)
    grid[4:12, 8] = 0  # wall with a gap at the bottom
    path = astar(grid, (8, 2), (8, 14))
    assert path and path[0] == (8, 2) and path[-1] == (8, 14)
    assert all(grid[r, c] for r, c in path)
    # fully walled off
    grid2 = np.ones((8, 8), np.uint8)
    grid2[:, 4] = 0
    assert astar(grid2, (2, 1), (2, 7)) == []
    wps = skeleton_waypoints(grid, (8, 2), (8, 14), every=5)
    assert wps[-1] == (8, 14) and len(wps) < len(path)


def test_astar_native_matches_python():
    from embodied_captioning_tpu.agents.planner import _astar_py
    from embodied_captioning_tpu.mapping.components import _load_native

    grid = np.ones((12, 12), np.uint8)
    grid[3:9, 6] = 0
    p_native = astar(grid, (5, 1), (5, 10))
    p_py = _astar_py(grid, (5, 1), (5, 10))
    if _load_native() is not None:
        assert len(p_native) == len(p_py)  # equal-cost paths


def test_policy_act_and_evaluate():
    cfg = PolicyConfig(map_size=64)
    params = init_policy(jax.random.PRNGKey(0), cfg)
    maps = jnp.zeros((3, 64, 64, 2))
    orient = jnp.asarray([0, 10, 71])
    a, raw, lp, v = act(params, jax.random.PRNGKey(1), maps, orient)
    assert a.shape == (3, 2)
    assert ((np.asarray(a) >= 0) & (np.asarray(a) <= 1)).all()
    lp2, ent, v2 = evaluate_actions(params, maps, orient, raw)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp2), rtol=1e-4,
                               atol=1e-5)
    assert float(ent) != 0.0


def test_gae_matches_reference_formula():
    t, e = 4, 2
    rng = np.random.default_rng(0)
    rewards = rng.random((t, e)).astype(np.float32)
    values = rng.random((t + 1, e)).astype(np.float32)
    masks = np.ones((t + 1, e), np.float32)
    gamma, tau = 0.99, 0.95
    ret, adv = compute_gae(jnp.asarray(rewards), jnp.asarray(values),
                           jnp.asarray(masks), gamma, tau)
    # manual reverse loop
    gae = np.zeros(e)
    expect = np.zeros((t, e))
    for i in reversed(range(t)):
        delta = rewards[i] + gamma * values[i + 1] - values[i]
        gae = delta + gamma * tau * gae
        expect[i] = gae
    np.testing.assert_allclose(np.asarray(adv), expect, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ret), expect + values[:-1],
                               rtol=1e-5, atol=1e-5)


def test_ppo_update_improves_objective():
    cfg = PolicyConfig(map_size=32)
    ppo_cfg = PPOConfig(num_mini_batch=2, ppo_epoch=2)
    params = init_policy(jax.random.PRNGKey(0), cfg)
    state = create_state(params, ppo_cfg)
    t, e = 4, 4
    rng = np.random.default_rng(0)
    rollout = Rollout(
        maps=rng.random((t + 1, e, 32, 32, 2)).astype(np.float32),
        orientation=rng.integers(0, 72, (t + 1, e)).astype(np.int32),
        raw_actions=rng.standard_normal((t, e, 2)).astype(np.float32),
        log_probs=rng.standard_normal((t, e)).astype(np.float32) - 2,
        values=rng.random((t + 1, e)).astype(np.float32),
        rewards=rng.random((t, e)).astype(np.float32),
        masks=np.ones((t + 1, e), np.float32),
    )
    new_state, metrics = ppo_update(state, rollout, jax.random.PRNGKey(1),
                                    ppo_cfg)
    assert np.isfinite(metrics["loss"])
    # params actually changed
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params,
        new_state.params)
    assert max(jax.tree_util.tree_leaves(diff)) > 0


def test_fifo_memory():
    m = FIFOMemory(3)
    for i in range(5):
        m.push(i)
    assert len(m) == 3 and list(m.buffer) == [2, 3, 4]
    got = m.sample(np.random.default_rng(0), 2)
    assert len(got) == 2


def test_render_attr_modes_exact():
    """Every render lowering is bit-exact with the gather form: the
    one-hot MXU attribute selection (default — replaces five per-pixel
    gathers, the TPU slow path) has exactly one nonzero f32 term per
    pixel; "+vr" only respells min/argmin as one variadic reduce with
    associative first-lowest-index tie-breaking; "+pk" runs the Pallas
    VMEM-fused visibility kernel (interpret mode on CPU)."""
    from embodied_captioning_tpu.config import SimConfig
    from embodied_captioning_tpu.envs.sim import generate_scene, render

    scene = generate_scene(SimConfig(scene_size=8.0, num_objects=6), seed=5)
    pose = np.eye(4, dtype=np.float32)
    pose[1, 3] = 0.88
    ref = render(scene, jnp.asarray(pose), 64, 64, 79.0, 15.0, "gather")
    for mode in ("onehot", "onehot16", "onehot+vr", "onehot+pk"):
        got = render(scene, jnp.asarray(pose), 64, 64, 79.0, 15.0, mode)
        for k in ("rgb", "depth", "instances", "classes"):
            np.testing.assert_array_equal(
                np.asarray(got[k]), np.asarray(ref[k]), err_msg=f"{mode}/{k}")


def test_render_tile_culled_exact():
    """Tile-culled render ("onehot@TxK"): per-tile conservative candidate
    sets keep the min AND first-min-index identical to the full slab test,
    so the output is bit-exact whenever no tile overflows K. Checked over
    several scenes/poses (incl. looking along the room, the worst case for
    per-tile candidate counts), with the overflow diagnostic asserted 0."""
    from embodied_captioning_tpu.config import SimConfig
    from embodied_captioning_tpu.envs.sim import (
        _tile_candidates, generate_scene, render,
    )
    from embodied_captioning_tpu.ops.geometry import intrinsics_from_hfov

    rng = np.random.default_rng(3)
    for seed in (5, 11):
        scene = generate_scene(
            SimConfig(scene_size=8.0, num_objects=6), seed=seed)
        for _ in range(3):
            yaw = rng.uniform(0, 2 * np.pi)
            c, s = np.cos(yaw), np.sin(yaw)
            pose = np.eye(4, dtype=np.float32)
            pose[:3, :3] = np.asarray(
                [[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
            pose[0, 3] = rng.uniform(1, 7)
            pose[2, 3] = rng.uniform(1, 7)
            pose[1, 3] = 0.88
            pose = jnp.asarray(pose)
            ref = render(scene, pose, 64, 64, 79.0, 15.0, "onehot")
            got = render(scene, pose, 64, 64, 79.0, 15.0, "onehot@16x48")
            for k in ("rgb", "depth", "instances", "classes"):
                np.testing.assert_array_equal(
                    np.asarray(got[k]), np.asarray(ref[k]),
                    err_msg=f"seed{seed}/{k}")
            fx, fy, xc, yc = intrinsics_from_hfov(64, 64, 79.0)
            _, _, overflow = _tile_candidates(
                scene, pose[:3, 3], pose[:3, :3], fx, fy, xc, yc,
                64, 64, 16, 48)
            assert int(overflow) == 0


def test_resolve_attr_mode(monkeypatch):
    """ECAP_RENDER_MODE is read per call; culled modes fall back to their
    base when the image size is not divisible by the tile."""
    from embodied_captioning_tpu.envs.sim import resolve_attr_mode

    monkeypatch.delenv("ECAP_RENDER_MODE", raising=False)
    assert resolve_attr_mode(None, 1280, 1280) == "onehot"
    assert resolve_attr_mode("gather", 1280, 1280) == "gather"
    monkeypatch.setenv("ECAP_RENDER_MODE", "onehot@128x40")
    assert resolve_attr_mode(None, 1280, 1280) == "onehot@128x40"
    assert resolve_attr_mode(None, 192, 192) == "onehot"  # 192 % 128 != 0
    assert resolve_attr_mode("onehot", 1280, 1280) == "onehot"


def test_sim_render_and_gt():
    from embodied_captioning_tpu.config import SensorConfig, SimConfig
    from embodied_captioning_tpu.envs.sim import RaycastSim

    sim = RaycastSim(SimConfig(scene_size=8.0, num_objects=5,
                               episode_steps=10),
                     SensorConfig(height=48, width=48), seed=3)
    obs = sim.observe()
    assert obs["rgb"].shape == (48, 48, 3)
    assert obs["depth"].shape == (48, 48)
    d = np.asarray(obs["depth"])
    assert (d > 0).all() and d.max() <= 15.0
    inst = np.asarray(obs["instances"])
    assert inst.min() >= -1
    det = sim.gt_detections(obs, max_instances=8)
    v = np.asarray(det.valid)
    if v.any():
        i = int(np.argmax(v))
        b = np.asarray(det.boxes[i])
        assert b[2] > b[0] and b[3] > b[1]
    # motion + collision
    collided = sim.step(1)
    assert isinstance(collided, bool)
    trav = sim.traversability(0.25)
    assert trav.sum() > 0


def test_env_rpc_surface():
    cfg = load_config("tiny", overrides=[
        "runtime.num_envs=1", "sensors.height=48", "sensors.width=48",
        "sim.scene_size=6.0", "sim.num_objects=4", "sim.episode_steps=5",
        "map.voxel_size=0.1",
    ])
    from embodied_captioning_tpu.envs.env import EmbodiedEnv

    env = EmbodiedEnv(cfg, env_id=1)
    assert env.get_episode_id() == 100000
    pos = env.get_agent_position()
    assert pos["position"].shape == (3,)
    upper, lower = env.get_upper_and_lower_map_bounds()
    assert (upper > lower).all()
    assert env.get_step() == 0
    obs, r, done, info = env.step(2)
    assert env.get_step() == 1 and not done
    maps = env.get_and_update_disagreement_map()
    assert maps.shape[-1] == 4
    assert env.get_reward() == 0.0  # nothing fused yet
    anns = env.get_semantic_annotations()
    assert isinstance(anns, list)
    path = env.get_path((1.0, 1.0), (5.0, 5.0))
    assert path.ndim == 2


def test_render_batch_chunked_matches_unchunked():
    """A budget that forces chunking must produce identical frames to the
    single-launch render_batch (the chunked path exists because 16 envs x
    1280^2 x n_boxes slab intermediates OOM a 16 GB chip)."""
    from embodied_captioning_tpu.config import SensorConfig, SimConfig
    from embodied_captioning_tpu.envs.sim import (
        RaycastSim, render_batch, render_batch_chunked,
    )

    sims = [RaycastSim(SimConfig(scene_size=8.0, num_objects=5,
                                 episode_steps=10),
                       SensorConfig(height=32, width=32), seed=s)
            for s in range(4)]
    scenes = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[s.scene for s in sims])
    poses = jnp.stack([jnp.asarray(s.agent.camera_matrix(), jnp.float32)
                       for s in sims])
    full = render_batch(scenes, poses, 32, 32, 90.0, 15.0)
    per_env = 32 * 32 * scenes.box_min.shape[-2] * 20
    chunked = render_batch_chunked(scenes, poses, 32, 32, 90.0, 15.0,
                                   budget_bytes=per_env * 2)  # -> chunk 2
    for k in full:
        np.testing.assert_array_equal(np.asarray(full[k]),
                                      np.asarray(chunked[k]))
