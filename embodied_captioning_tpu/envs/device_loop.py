"""Scan-fused device loop: K env+perception steps per device launch.

The reference's agent loop fences the device every step — habitat renders,
Mask2Former detects, CoCa captions, then the host reads rewards before
choosing the next action (ref: experimenting_env/agents/goal_exploration/
goal_exploration.py:664-757). On this rig the per-RPC tunnel latency drifts
by day (~27 ms to ~0.3 s per fence — CLAUDE.md); a loop that fences every
iteration inherits the link's bad days (round 4 measured the identical
program at 0.25x of round 3's loop fps purely from RPC regime).

This module makes the loop fence-tolerant BY DESIGN: the agent state update
(pose + collision), the raycast render, and the fused perception program all
run under ONE `lax.scan` over K steps, so a window of K env steps costs one
launch + one scalar fence instead of 2K RPCs. Semantically faithful: the
reference replans goals every 80 steps and updates PPO every 20
(ref: confs/habitat/gibson_goal_exploration.yaml:201-203), so per-step host
readback is not required — actions within a window follow the current
subgoal controller, exactly like the reference's SubGoalFollower executing
a plan between replans.

`step_agents` mirrors RaycastSim.step / RaycastSim._blocked bit-for-meaning
(collision = rejected forward move; see tests/test_device_loop.py parity
tests), and `camera_poses` mirrors AgentState.camera_matrix (yaw about +Y,
camera at agent + [0, AGENT_HEIGHT, 0]).

Two rollout flavors:
  rollout_perception   step -> render -> perceive, checksum only — the
                       throughput workload of bench.py's loop mode.
  rollout_fused        additionally fuses detections+embeddings into each
                       env's device voxel map and emits the per-step
                       disagreement rewards (the full BASELINE config #5
                       semantics: detect->caption->embed->fuse->reward),
                       vmapped over envs. Used by the PPO budget runs.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ExperimentConfig, MapConfig, SimConfig
from ..mapping import voxel_map as V
from ..perception import PerceptionParams, perceive
from .sim import (ACTION_FORWARD, ACTION_LEFT, ACTION_RIGHT, AGENT_HEIGHT,
                  AGENT_RADIUS, RaycastSim, Scene, render)


class LoopState(NamedTuple):
    """Per-env agent state, [E]-vectorized (device-resident)."""

    x: jnp.ndarray      # [E] f32
    z: jnp.ndarray      # [E] f32
    yaw: jnp.ndarray    # [E] f32 radians about +Y (yaw=0 faces -Z)
    collided: jnp.ndarray  # [E] bool — last step's forward move was blocked


def states_from_sims(sims) -> Tuple[Scene, LoopState]:
    """Stack host RaycastSims into a batched Scene + LoopState."""
    scenes = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[s.scene for s in sims])
    state = LoopState(
        x=jnp.asarray([s.agent.x for s in sims], jnp.float32),
        z=jnp.asarray([s.agent.z for s in sims], jnp.float32),
        yaw=jnp.asarray([s.agent.yaw for s in sims], jnp.float32),
        collided=jnp.zeros((len(sims),), bool),
    )
    return scenes, state


def blocked(scene: Scene, x, z, scene_size: float) -> jnp.ndarray:
    """JAX mirror of RaycastSim._blocked for one env (scalars x, z).

    Boxes whose top is at/below 0.05 m (floor) or whose bottom is above
    the agent's head don't block; otherwise the agent's radius-expanded
    (x, z) footprint vs the box footprint decides. Out-of-room is blocked.
    """
    mn, mx = scene.box_min, scene.box_max
    relevant = scene.valid & (mx[:, 1] > 0.05) & (mn[:, 1]
                                                  <= AGENT_HEIGHT + 0.4)
    inside = ((x > mn[:, 0] - AGENT_RADIUS) & (x < mx[:, 0] + AGENT_RADIUS)
              & (z > mn[:, 2] - AGENT_RADIUS) & (z < mx[:, 2] + AGENT_RADIUS))
    oob = ~((x > AGENT_RADIUS) & (x < scene_size - AGENT_RADIUS)
            & (z > AGENT_RADIUS) & (z < scene_size - AGENT_RADIUS))
    return jnp.any(relevant & inside) | oob


def step_agents(scenes: Scene, state: LoopState, actions: jnp.ndarray,
                sim_cfg: SimConfig) -> LoopState:
    """One discrete action per env (vectorized RaycastSim.step):
    1 forward `forward_step` meters (rejected on collision), 2 turn left,
    3 turn right, 0/other no-op. Returns the new state; `collided` is True
    where a forward move was blocked (agent_collision_sensor semantics,
    ref: envs/sensors.py:866-906)."""
    fs = sim_cfg.forward_step
    turn = float(np.deg2rad(sim_cfg.turn_angle_deg))
    nx = state.x - jnp.sin(state.yaw) * fs
    nz = state.z - jnp.cos(state.yaw) * fs
    hit = jax.vmap(blocked, in_axes=(0, 0, 0, None))(
        scenes, nx, nz, sim_cfg.scene_size)
    fwd = actions == ACTION_FORWARD
    move = fwd & ~hit
    return LoopState(
        x=jnp.where(move, nx, state.x),
        z=jnp.where(move, nz, state.z),
        yaw=state.yaw + turn * ((actions == ACTION_LEFT).astype(jnp.float32)
                                - (actions == ACTION_RIGHT
                                   ).astype(jnp.float32)),
        collided=fwd & hit,
    )


def camera_poses(state: LoopState) -> jnp.ndarray:
    """[E, 4, 4] T_world_cam: R_y(yaw), camera at agent + [0, 0.88, 0]
    (AgentState.camera_matrix: Pose.camera_pose with the habitat sensor
    offset, ref: sensor_data.py:108-122)."""
    c, s = jnp.cos(state.yaw), jnp.sin(state.yaw)
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    R = jnp.stack([
        jnp.stack([c, zero, s], -1),
        jnp.stack([zero, one, zero], -1),
        jnp.stack([-s, zero, c], -1),
    ], -2)                                                  # [E, 3, 3]
    t = jnp.stack([state.x, jnp.full_like(c, AGENT_HEIGHT), state.z], -1)
    T = jnp.zeros((state.x.shape[0], 4, 4), jnp.float32)
    T = T.at[:, :3, :3].set(R)
    T = T.at[:, :3, 3].set(t)
    return T.at[:, 3, 3].set(1.0)


def _render_scan(scenes: Scene, poses: jnp.ndarray, cfg: ExperimentConfig,
                 want_depth: bool):
    """Memory-bounded batch render inside a scan body. Large frames go
    through `lax.map` per env (the [H, W, n_boxes] slab-test intermediates
    are ~20 B/ray/box — vmapping the whole batch OOMs at 1280^2,
    CLAUDE.md); small frames vmap, which also keeps a sharded env axis
    parallel across chips (lax.map's sequential slicing would serialize
    it)."""
    s = cfg.sensors

    def one(args):
        scene, pose = args
        out = render(scene, pose, s.height, s.width, s.hfov_deg,
                     s.max_depth, "onehot")
        if want_depth:
            return out["rgb"], out["depth"], out["instances"], out["classes"]
        return out["rgb"]

    slab = s.height * s.width * scenes.box_min.shape[-2] * 20
    if slab <= 256 << 20:
        return jax.vmap(lambda sc, p: one((sc, p)))(scenes, poses)
    return jax.lax.map(one, (scenes, poses))


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(2,))
def rollout_perception(params: PerceptionParams, scenes: Scene,
                       state: LoopState, actions: jnp.ndarray, rng,
                       cfg: ExperimentConfig):
    """K fused loop steps: step agents -> render -> perceive. One launch,
    one scalar to fence.

    Args:
      actions: [K, E] i32.
    Returns (state', checksum [] f32, valid_detections [] i32).
    """

    def body(carry, acts):
        st, key = carry
        st = step_agents(scenes, st, acts, cfg.sim)
        rgb = _render_scan(scenes, camera_poses(st), cfg, want_depth=False)
        key, sub = jax.random.split(key)
        r = perceive(params, rgb, sub, cfg)
        cs = (jnp.sum(r.detections.boxes) + jnp.sum(r.detections.scores)
              + jnp.sum(r.caption_tokens) + jnp.sum(r.detections.embeddings))
        return (st, key), (cs, jnp.sum(r.detections.valid))

    (state, _), (css, nval) = jax.lax.scan(body, (state, rng), actions)
    return state, jnp.sum(css), jnp.sum(nval)


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(2, 3))
def rollout_fused(params: PerceptionParams, scenes: Scene, state: LoopState,
                  map_states: V.VoxelMapState, actions: jnp.ndarray, rng,
                  cfg: ExperimentConfig):
    """K fused FULL loop steps (BASELINE config #5 semantics): step ->
    render -> perceive -> voxel-fuse -> disagreement reward, with the
    per-env voxel maps carried through the scan ([E]-vmapped
    VoxelMapState).

    Returns (state', map_states', rewards [K, E], collided [K, E]).
    The reward is the post-fusion disagreement sum / 1000 per env per step
    (ref: env_habitat3.py:75-84) — exactly what the unfused loop reads
    back via env RPC, but fenced once per window.
    """
    mcfg: MapConfig = cfg.map

    def body(carry, acts):
        st, maps, key = carry
        st = step_agents(scenes, st, acts, cfg.sim)
        poses = camera_poses(st)
        rgb, depth, _, _ = _render_scan(scenes, poses, cfg, want_depth=True)
        key, sub = jax.random.split(key)
        r = perceive(params, rgb, sub, cfg)
        det = r.detections
        if depth.shape[-1] != det.masks.shape[-1]:  # paste raster (env.py)
            stride = depth.shape[-1] // det.masks.shape[-1]
            if stride * det.masks.shape[-1] == depth.shape[-1]:
                depth_m = depth[:, ::stride, ::stride]
            else:
                from ..ops.image import resize_bilinear

                depth_m = resize_bilinear(
                    depth[..., None], det.masks.shape[-2],
                    det.masks.shape[-1])[..., 0]
        else:
            depth_m = depth

        def fuse(ms, dep, pose, det_e):
            return V.integrate_frame(
                ms, dep, pose, det_e.masks, det_e.classes, det_e.logits,
                det_e.embeddings, det_e.valid, mcfg,
                hfov_deg=cfg.sensors.hfov_deg,
                min_depth=cfg.sensors.min_depth,
                max_depth=cfg.sensors.max_depth)

        maps = jax.vmap(fuse)(maps, depth_m, poses, det)
        rew = jax.vmap(lambda ms: V.disagreement_reward(
            ms, mcfg, scale=cfg.ppo.reward_scale))(maps)
        return (st, maps, key), (rew, st.collided)

    (state, map_states, _), (rewards, collided) = jax.lax.scan(
        body, (state, map_states, rng), actions)
    return state, map_states, rewards, collided


def make_action_plan(num_steps: int, num_envs: int,
                     pattern: str = "explore", seed: int = 0) -> np.ndarray:
    """[K, E] i32 action plans for windows between host replans.
    "explore": mostly-forward with period turns (the loop bench's
    1 + (i % 3) cadence); "random": uniform forward/left/right."""
    if pattern == "explore":
        k = np.arange(num_steps)[:, None]
        return np.broadcast_to(1 + (k % 3),
                               (num_steps, num_envs)).astype(np.int32)
    rng = np.random.default_rng(seed)
    return rng.integers(1, 4, size=(num_steps, num_envs)).astype(np.int32)
