"""Exploration baselines + the observation-generation loop.

Parity with the reference's trainer family (ref: experimenting_env/agents/
baselines.py): `randombaseline` (:160), `bouncebaseline` (:178-207, 16-step
turn on collision), `rotatebaseline` (:210-221), `frontierbaseline-v1`
(:575-865, frontier detection on the explored map + info-gain goal choice +
A* subgoals), `randomgoalsbaseline` (:1581-1877, uniform random map goal),
and the `SubGoalFollower` polar pointgoal controller (:1804-1877). Each
trainer exposes `.train()` / `.generate()`; `generate()` walks the envs,
runs perception, fuses the voxel map, and writes npz observations
(ref: baselines.py:130-157).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ExperimentConfig
from ..envs.vector_env import VectorEnv
from ..envs.sim import (
    ACTION_FORWARD, ACTION_LEFT, ACTION_RIGHT, ACTION_STOP,
)
from ..mapping.matching import IdAllocator, unique_ids
from ..perception import Perceiver
from ..sensor_data import Pose
from ..utils.obs_store import save_obs
from .planner import skeleton_waypoints
from .registry import register_trainer


class SubGoalFollower:
    """Polar pointgoal controller (ref: baselines.py:1804-1877): turn until
    the heading error is below the turn angle, then move forward; STOP
    within `goal_radius`."""

    def __init__(self, turn_deg: float = 10.0, goal_radius: float = 0.3):
        self.turn = np.deg2rad(turn_deg)
        self.goal_radius = goal_radius

    def act(self, agent_xz: Tuple[float, float], yaw: float,
            goal_xz: Tuple[float, float]) -> int:
        dx = goal_xz[0] - agent_xz[0]
        dz = goal_xz[1] - agent_xz[1]
        if np.hypot(dx, dz) < self.goal_radius:
            return ACTION_STOP
        # heading: yaw=0 faces -Z; forward = (-sin yaw, -cos yaw)
        desired = np.arctan2(-dx, -dz)
        err = (desired - yaw + np.pi) % (2 * np.pi) - np.pi
        if err > self.turn / 2:
            return ACTION_LEFT
        if err < -self.turn / 2:
            return ACTION_RIGHT
        return ACTION_FORWARD


class BaseTrainer:
    """Shared loop: vector envs + perception + voxel fusion + obs store
    (ref: baselines.py:49-157 Baseline)."""

    def __init__(self, cfg: ExperimentConfig, perceiver: Optional[Perceiver]
                 = None, with_perception: bool = True):
        self.cfg = cfg
        self.envs = VectorEnv(cfg)
        self.perceiver = perceiver or (Perceiver(cfg, seed=cfg.runtime.seed)
                                       if with_perception else None)
        self.id_alloc = IdAllocator()
        self.follower = SubGoalFollower(cfg.sim.turn_angle_deg)
        self.obs_dir = cfg.runtime.obs_dir
        self.saved_paths: List[str] = []
        self._step = 0

    # -- policy interface (override per baseline) -------------------------
    def actions(self, obs) -> List[int]:
        raise NotImplementedError

    def on_episode_reset(self, i: int) -> None:
        """Env `i` auto-reset into a NEW episode/scene this step: per-env
        plan/goal state derived from the old scene must be discarded
        (stale waypoints can be inside the new scene's walls)."""

    def on_step(self, obs, infos) -> None:
        pass

    # -- perception + fusion ----------------------------------------------
    def perceive_and_fuse(self, obs) -> Optional[object]:
        """Run the fused perception program on the env batch and integrate
        detections into each env's voxel map (ref: goal_exploration.py:77-144
        predict_current_bbs_and_update_pcd)."""
        if self.perceiver is None:
            return None
        result = self.perceiver.process(np.asarray(obs["rgb"]))
        det = result.detections
        for i, env in enumerate(self.envs.envs):
            d_i = jnp.asarray(obs["depth"][i])
            pose = jnp.asarray(env.sim.agent.camera_matrix(), jnp.float32)
            per_env = det.index(i)
            # masks were produced at detector resolution; resize to sensor
            if per_env.masks.shape[-1] != d_i.shape[-1]:
                from ..ops.image import resize_bilinear

                m = resize_bilinear(
                    jnp.moveaxis(per_env.masks, 0, -1),
                    d_i.shape[0], d_i.shape[1])
                per_env = per_env.replace(masks=jnp.moveaxis(m, -1, 0))
                scale = d_i.shape[0] / self.cfg.detector.image_size
                per_env = per_env.replace(boxes=per_env.boxes * scale)
            env.update_pointcloud(per_env, depth=d_i, pose=pose)
            if hasattr(env, "set_last_frame"):
                # KL-reward env variant needs the frame's detections
                # (ref: env_semantic_disagreement_kl.py)
                env.set_last_frame(per_env, d_i, pose)
        return result

    def save_step_obs(self, obs, result) -> None:
        if not self.obs_dir:
            return
        for i, env in enumerate(self.envs.envs):
            # dispatch-time snapshot, NOT live getters: this runs while the
            # VectorEnv worker thread is already stepping frame t+1, so
            # env.get_agent_position()/get_step() would race the in-flight
            # step and record frame t+1's (possibly torn) pose for frame t
            snap = self.envs.snapshot_at(i)
            payload: Dict[str, object] = {
                "rgb": np.asarray(obs["rgb"][i]),
                "depth": np.asarray(obs["depth"][i]),
                "position": np.array(
                    Pose(**snap["position"]).to_dict(), dtype=object),
            }
            if result is not None:
                d = result.detections.index(i)
                nd = d.to_numpy_dict()
                obj_ids, ep_ids = unique_ids(d, self.id_alloc,
                                             snap["episode_id"])
                nd["object_ids"] = obj_ids
                nd["episode_ids"] = ep_ids
                caps = self.perceiver.captions(result)[i]
                nd["captions"] = np.array(caps, dtype=object)
                payload["bbs"] = np.array({"instances": nd}, dtype=object)
            if (getattr(self.cfg.runtime, "save_gt_obs", False)
                    and "instances" in obs):
                # GT detection sensor output (ref: envs/sensors.py:101-234
                # 'bbsgt'): persistent per-scene instance ids — the id
                # source the reference's consensus matching uses
                from ..envs.sensors import get_sensor

                gt = get_sensor("object_detector_gt")(
                    env, {k: obs[k][i] for k in ("instances", "classes",
                                                 "depth", "rgb")
                          if k in obs})
                gd = gt.to_numpy_dict()
                gd["object_ids"] = np.asarray(gt.object_ids)
                payload["bbsgt"] = np.array({"instances": gd}, dtype=object)
            dir_i = os.path.join(self.obs_dir, f"env{i}")
            self.saved_paths += save_obs(dir_i, snap["episode_id"],
                                         payload, snap["step"])

    # -- loops -------------------------------------------------------------
    def generate(self, num_steps: Optional[int] = None) -> List[str]:
        """Exploration + obs recording (ref: baselines.py:130-157).

        Double-buffered: after fusing frame t and choosing actions, frame
        t+1's simulation/render is dispatched on the VectorEnv worker thread
        (`step_async`) while this thread blocks on frame t's perception
        readbacks and writes the npz observations — the agent loop never
        idles waiting on inference (north-star pipeline)."""
        steps = num_steps or self.cfg.sim.episode_steps
        obs = self.envs.observe()
        for _ in range(steps):
            result = self.perceive_and_fuse(obs)
            acts = self.actions(obs)
            self.envs.step_async(acts)         # sim t+1 in flight
            self.save_step_obs(obs, result)    # host IO overlaps the render
            obs, _, dones, infos = self.envs.step_wait()
            for i in np.flatnonzero(np.asarray(dones)):
                self.on_episode_reset(int(i))
            self.on_step(obs, infos)
            self._step += 1
        return sorted(self.saved_paths)

    def train(self, num_steps: Optional[int] = None):
        return self.generate(num_steps)

    def rewards(self) -> np.ndarray:
        return np.asarray([env.get_reward() for env in self.envs.envs])

    # -- scan-fused stepping ------------------------------------------------
    def fused_window(self, window: int) -> np.ndarray:
        """Run `window` env+perception+fusion steps as ONE device launch
        (envs/device_loop.rollout_fused) instead of `window` fenced
        iterations — the fence-tolerant loop (one RPC per window vs 2K;
        the tunnel's per-RPC latency drifts by day, CLAUDE.md).

        Semantics match the unfused loop (tests/test_device_loop.py proves
        reward parity): the controller (`self.actions`) reads only host
        state, so the window's action plan is computed by shadow-stepping
        the host sims WITHOUT rendering (env.step_state — the device agent
        step is bit-parity with it), then the device executes the same
        plan with perception + voxel fusion fused under `lax.scan`. After
        the window the device pose is copied back over the host shadow so
        f32-vs-f64 drift cannot accumulate across windows.

        Constraint: a `done` (episode end) must land on the window
        boundary — callers pick window | episode_steps. Mid-window resets
        would need the unfused path.

        Returns the per-env done mask for the window.
        """
        from ..envs.device_loop import rollout_fused, states_from_sims

        e = self.envs.num_envs
        scenes, state0 = states_from_sims([env.sim for env in self.envs.envs])
        maps0 = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[env.map_state
                                         for env in self.envs.envs])
        plan = np.zeros((window, e), np.int32)
        win_done = np.zeros(e, bool)
        for k in range(window):
            acts = self.actions(None)
            plan[k] = acts
            for i, env in enumerate(self.envs.envs):
                _, d, _ = env.step_state(int(acts[i]))
                win_done[i] |= d
            assert not (win_done.any() and k < window - 1), (
                "episode end mid-window: choose window | episode_steps")
        self.perceiver._rng, sub = jax.random.split(self.perceiver._rng)
        state1, maps1, _, collided = rollout_fused(
            self.perceiver.params, scenes, state0, maps0,
            jnp.asarray(plan), sub, self.cfg)
        xs = np.asarray(state1.x)
        zs = np.asarray(state1.z)
        yaws = np.asarray(state1.yaw)
        last_hit = np.asarray(collided[-1])
        for i, env in enumerate(self.envs.envs):
            env.map_state = jax.tree_util.tree_map(lambda a, j=i: a[j], maps1)
            if win_done[i]:
                env.reset()  # fresh scene+map; device pose is stale
                self.on_episode_reset(i)
            else:
                env.sim.agent.x = float(xs[i])
                env.sim.agent.z = float(zs[i])
                env.sim.agent.yaw = float(yaws[i])
                env._collision = bool(last_hit[i])
        self._step += window
        return win_done


@register_trainer("randombaseline")
class RandomBaseline(BaseTrainer):
    """Uniform random discrete actions (ref: baselines.py:160)."""

    def __init__(self, cfg, **kw):
        super().__init__(cfg, **kw)
        self._rng = np.random.default_rng(cfg.runtime.seed)

    def actions(self, obs) -> List[int]:
        return list(self._rng.integers(1, 4, self.envs.num_envs))


@register_trainer("rotatebaseline")
class RotateBaseline(BaseTrainer):
    """Turn in place (ref: baselines.py:210-221)."""

    def actions(self, obs) -> List[int]:
        return [ACTION_LEFT] * self.envs.num_envs


@register_trainer("bouncebaseline")
class BounceBaseline(BaseTrainer):
    """Go straight; on collision turn for 16 steps in a random direction
    (ref: baselines.py:178-207)."""

    TURN_STEPS = 16

    def __init__(self, cfg, **kw):
        super().__init__(cfg, **kw)
        self._rng = np.random.default_rng(cfg.runtime.seed)
        self._turning = np.zeros(self.envs.num_envs, np.int32)
        self._dir = np.full(self.envs.num_envs, ACTION_LEFT, np.int32)

    def actions(self, obs) -> List[int]:
        acts = []
        for i, env in enumerate(self.envs.envs):
            if env.collided() and self._turning[i] == 0:
                self._turning[i] = self.TURN_STEPS
                self._dir[i] = (ACTION_LEFT if self._rng.random() < 0.5
                                else ACTION_RIGHT)
            if self._turning[i] > 0:
                self._turning[i] -= 1
                acts.append(int(self._dir[i]))
            else:
                acts.append(ACTION_FORWARD)
        return acts


class _GoalDirectedTrainer(BaseTrainer):
    """Shared machinery: per-env goal, A* waypoints, follower control."""

    def __init__(self, cfg, **kw):
        super().__init__(cfg, **kw)
        self._rng = np.random.default_rng(cfg.runtime.seed + 7)
        n = self.envs.num_envs
        self._waypoints: List[List[Tuple[float, float]]] = [[] for _ in
                                                            range(n)]
        self.plan_resolution = 0.1

    def _plan_to(self, i: int, goal_xz: Tuple[float, float]) -> None:
        env = self.envs.envs[i]
        grid = env.traversability(self.plan_resolution)
        res = self.plan_resolution
        a = env.sim.agent
        start = (int(a.z / res), int(a.x / res))
        goal = (int(goal_xz[1] / res), int(goal_xz[0] / res))
        wps = skeleton_waypoints(grid, start, goal, every=8)
        self._waypoints[i] = [((c + 0.5) * res, (r + 0.5) * res)
                              for r, c in wps][1:]

    def on_episode_reset(self, i: int) -> None:
        self._waypoints[i] = []

    def _follow(self, i: int) -> int:
        env = self.envs.envs[i]
        a = env.sim.agent
        while self._waypoints[i]:
            gx, gz = self._waypoints[i][0]
            if np.hypot(gx - a.x, gz - a.z) < 0.3:
                self._waypoints[i].pop(0)
                continue
            return self.follower.act((a.x, a.z), a.yaw, (gx, gz))
        return ACTION_STOP

    def new_goal(self, i: int) -> Tuple[float, float]:
        raise NotImplementedError

    def actions(self, obs) -> List[int]:
        acts = []
        for i in range(self.envs.num_envs):
            if not self._waypoints[i]:
                self._plan_to(i, self.new_goal(i))
            a = self._follow(i)
            if a == ACTION_STOP:
                self._waypoints[i] = []
                a = ACTION_LEFT  # scan while waiting for a new goal
            acts.append(a)
        return acts


@register_trainer("randomgoalsbaseline")
class RandomGoalsBaseline(_GoalDirectedTrainer):
    """Uniform random reachable map goals + A* (ref: baselines.py:1581-1877)."""

    def new_goal(self, i: int) -> Tuple[float, float]:
        size = self.cfg.sim.scene_size
        for _ in range(50):
            g = (self._rng.uniform(0.4, size - 0.4),
                 self._rng.uniform(0.4, size - 0.4))
            if not self.envs.envs[i].sim._blocked(*g):
                return g
        return (size / 2, size / 2)


@register_trainer("frontierbaseline-v1")
class FrontierBaseline(_GoalDirectedTrainer):
    """Frontier exploration (ref: baselines.py:575-865): frontiers = free
    cells adjacent to unexplored space on the env's topdown map; goal = the
    frontier with the largest unexplored neighborhood (info gain)."""

    def _gain_field(self, maps: np.ndarray) -> np.ndarray:
        """Per-cell information value integrated around each frontier;
        v1 counts unexplored cells."""
        return (~(maps[..., 1] > 0.5)).astype(np.float64)

    def new_goal(self, i: int) -> Tuple[float, float]:
        env = self.envs.envs[i]
        maps = env.get_and_update_disagreement_map()  # [Z, X, 4]
        explored = maps[..., 1] > 0.5
        obstacle = maps[..., 0] > 0.5
        free = explored & ~obstacle
        # frontier: free cell with an unexplored 4-neighbor
        unexp = ~explored
        nb = (np.roll(unexp, 1, 0) | np.roll(unexp, -1, 0)
              | np.roll(unexp, 1, 1) | np.roll(unexp, -1, 1))
        frontier = free & nb
        ys, xs = np.nonzero(frontier)
        if len(ys) == 0:
            return RandomGoalsBaseline.new_goal(self, i)  # fallback
        # info gain in an 11x11 window — whole map at once with a box filter
        # over the summed-area table (O(map) instead of
        # O(frontiers * window); stays usable at the reference's 0.025 m
        # rasters)
        field = self._gain_field(np.asarray(maps))
        ii = np.zeros((field.shape[0] + 1, field.shape[1] + 1), np.float64)
        ii[1:, 1:] = np.cumsum(np.cumsum(field, 0), 1)
        h, w = field.shape
        y0 = np.clip(ys - 5, 0, h)
        y1 = np.clip(ys + 6, 0, h)
        x0 = np.clip(xs - 5, 0, w)
        x1 = np.clip(xs + 6, 0, w)
        gains = ii[y1, x1] - ii[y0, x1] - ii[y1, x0] + ii[y0, x0]
        j = int(np.argmax(gains))
        vox = self.cfg.map.voxel_size
        lower = np.asarray(env.map_state.lower)
        # +0.5: CELL CENTER, like every other cell->world conversion
        # (registry.py get_distance, _plan_to) — the bare corner biases
        # goals half a voxel toward the map origin
        return ((xs[j] + 0.5) * vox + lower[0],
                (ys[j] + 0.5) * vox + lower[2])


@register_trainer("observeobjectbaseline")
class ObserveObjectBaseline(_GoalDirectedTrainer):
    """Scripted object-orbiting tracker (ref: baselines.py:1202-1578): pick a
    GT object, walk viewpoints around it to gather multi-view captions."""

    ORBIT_RADIUS = 1.6
    ORBIT_POINTS = 8

    def __init__(self, cfg, **kw):
        super().__init__(cfg, **kw)
        self._orbits: List[List[Tuple[float, float]]] = [
            [] for _ in range(self.envs.num_envs)]

    def on_episode_reset(self, i: int) -> None:
        super().on_episode_reset(i)
        self._orbits[i] = []  # old scene's object viewpoints

    def new_goal(self, i: int) -> Tuple[float, float]:
        env = self.envs.envs[i]
        if not self._orbits[i]:
            anns = env.get_semantic_annotations()
            if anns:
                k = self._rng.integers(0, len(anns))
                mn = np.asarray(anns[k]["aabb_min"])
                mx = np.asarray(anns[k]["aabb_max"])
                c = (mn + mx) / 2
                angles = np.linspace(0, 2 * np.pi, self.ORBIT_POINTS,
                                     endpoint=False)
                pts = [(float(c[0] + self.ORBIT_RADIUS * np.cos(a)),
                        float(c[2] + self.ORBIT_RADIUS * np.sin(a)))
                       for a in angles]
                self._orbits[i] = [p for p in pts
                                   if not env.sim._blocked(*p)]
        if self._orbits[i]:
            return self._orbits[i].pop(0)
        return RandomGoalsBaseline.new_goal(self, i)
