"""Environment: simulator + per-episode device voxel map + reward.

API parity with the reference's main env (ref: experimenting_env/envs/
env_habitat3.py:19-208 Habitat3Env): the same RPC surface the agents call
through VectorEnv — ``get_agent_position``, ``get_upper_and_lower_map_bounds``,
``update_pointcloud``, ``get_and_update_disagreement_map``, ``get_reward``
(= disagreement sum / 1000, ref :75-84), ``get_scene``, ``get_episode_id``,
``get_step``, ``get_path``, plus the kl-scored variant
(ref: envs/env_semantic_disagreement_kl.py).

The architectural inversion vs the reference: the 3D fusion state does NOT
live in a forked env worker process — it is a VoxelMapState on the TPU,
updated by the jit'd `integrate_frame`, so the detect→caption→embed→fuse→
reward chain never leaves the device.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import ExperimentConfig
from ..mapping import voxel_map as V
from ..mapping.components import _load_native
from ..ops.detections import Detections
from .sim import ACTION_FORWARD, RaycastSim


def _match_raster(depth: jnp.ndarray, masks: jnp.ndarray) -> jnp.ndarray:
    """Subsample sensor-resolution depth to the detection-mask raster (the
    large preset pastes masks at cfg.detector.paste_size < sensor size;
    voxel fusion needs the two aligned). Exact stride subsample when the
    ratio is integral — bilinear would average across depth discontinuities
    and invent phantom 3D points."""
    if depth.shape[-1] == masks.shape[-1]:
        return depth
    stride = depth.shape[-1] // masks.shape[-1]
    if stride * masks.shape[-1] == depth.shape[-1]:
        return depth[::stride, ::stride]
    from ..ops.image import resize_bilinear

    return resize_bilinear(depth, masks.shape[-2], masks.shape[-1])


class EmbodiedEnv:
    """One environment = one scene + one agent + one device voxel map."""

    def __init__(self, cfg: ExperimentConfig, env_id: int = 0,
                 seed: Optional[int] = None):
        self.cfg = cfg
        self.env_id = env_id
        self._seed = (seed if seed is not None
                      else cfg.sim.scene_seed + 1000 * env_id)
        self.sim: RaycastSim = None  # type: ignore
        self.map_state: V.VoxelMapState = None  # type: ignore
        # episode ids are globally unique across envs (habitat's episode
        # iterator hands each worker distinct episodes; the npz store keys
        # on episode id, so collisions would shadow files)
        self._episode_base = env_id * 100000
        self.episode_id = self._episode_base - 1
        self.step_count = 0
        self._collision = False
        self._trav = None
        self.reset()

    # -- episode lifecycle ------------------------------------------------
    def reset(self) -> Dict[str, np.ndarray]:
        self.episode_id += 1
        self.step_count = 0
        self.sim = RaycastSim(self.cfg.sim, self.cfg.sensors,
                              seed=self._seed + self.episode_id)
        lower, _ = self.sim.bounds()
        self.map_state = V.create(self.cfg.map, lower_bound=lower,
                                  episode=self.episode_id)
        self._trav = None
        self._collision = False
        # per-episode sensor caches (position_sensor's episode start,
        # movement_sensor's previous position) belong to the OLD episode
        for attr in ("_start_position", "_prev_position"):
            if hasattr(self, attr):
                delattr(self, attr)
        return self.observe()

    def observe(self) -> Dict[str, np.ndarray]:
        obs = self.sim.observe()
        return obs

    def traversability(self, resolution: float = 0.1) -> np.ndarray:
        """Per-resolution cached free-space grid. The cache keys on the
        resolution — sharing one unkeyed slot between get_path(res=...) and
        area_ratio's 0.1 silently mis-scaled whichever came second."""
        if self._trav is None or self._trav[0] != resolution:
            self._trav = (resolution, self.sim.traversability(resolution))
        return self._trav[1]

    def step_state(self, action: int) -> Tuple[float, bool, Dict]:
        """Advance agent/sim state WITHOUT rendering — the VectorEnv
        batched path renders every env's frame in one device launch."""
        self._collision = self.sim.step(int(action))
        self.step_count += 1
        done = self.step_count >= self.cfg.sim.episode_steps
        info = {"collision": self._collision, "step": self.step_count}
        return 0.0, done, info

    def step(self, action: int) -> Tuple[Dict[str, np.ndarray], float, bool,
                                         Dict]:
        reward, done, info = self.step_state(action)
        return self.observe(), reward, done, info

    # -- RPC surface (parity with Habitat3Env) ----------------------------
    def set_goals(self, goals) -> None:
        """Store navigation goals [(x, z), ...] (ref: env_base.py:13-72
        BaseEnv.set_goals)."""
        self.goals = [tuple(g) for g in goals]

    def get_goals(self):
        return getattr(self, "goals", [])

    def get_agent_position(self) -> Dict[str, np.ndarray]:
        pose = self.sim.agent.pose()
        return {"position": pose.position, "orientation": pose.orientation}

    def get_upper_and_lower_map_bounds(self) -> Tuple[np.ndarray, np.ndarray]:
        lower, upper = self.sim.bounds()
        return upper, lower

    def get_scene(self) -> str:
        return f"raycast-{self._seed}"

    def get_episode_id(self) -> int:
        return self.episode_id

    def get_step(self) -> int:
        return self.step_count

    def collided(self) -> bool:
        return self._collision

    def update_pointcloud(self, detections: Detections,
                          depth: Optional[jnp.ndarray] = None,
                          pose: Optional[jnp.ndarray] = None) -> None:
        """Fuse one frame's (captioned, embedded) detections into the voxel
        map (ref: env_habitat3.py:151-184 update_pointcloud)."""
        if depth is None or pose is None:
            obs = self.sim.observe()
            depth = obs["depth"]
            pose = jnp.asarray(self.sim.agent.camera_matrix(), jnp.float32)
        emb = detections.embeddings
        if emb is None:
            emb = jnp.zeros((detections.capacity, self.cfg.map.embed_dim))
        depth = _match_raster(depth, detections.masks)
        self.map_state = V.integrate_frame(
            self.map_state, depth, pose, detections.masks,
            detections.classes, detections.logits, emb, detections.valid,
            self.cfg.map, hfov_deg=self.cfg.sensors.hfov_deg,
            min_depth=self.cfg.sensors.min_depth,
            max_depth=self.cfg.sensors.max_depth)

    def get_and_update_disagreement_map(self) -> np.ndarray:
        """4-channel topdown map; channel 3 is disagreement
        (ref: env_habitat3.py get_and_update_disagreement_map)."""
        return np.asarray(V.topdown_maps(self.map_state, self.cfg.map))

    def get_reward(self) -> float:
        """disagreement_map.sum() / 1000 (ref: env_habitat3.py:75-84)."""
        return float(V.disagreement_reward(
            self.map_state, self.cfg.map,
            scale=self.cfg.ppo.reward_scale))

    def get_kl_reward(self, detections: Detections, depth, pose) -> float:
        """Entropy-style variant (ref: env_semantic_disagreement_kl.py)."""
        depth = _match_raster(depth, detections.masks)
        kls = V.kl_score(self.map_state, depth, pose, detections.masks,
                         detections.logits, detections.valid, self.cfg.map,
                         hfov_deg=self.cfg.sensors.hfov_deg)
        return float(jnp.sum(kls))

    def get_path(self, start_xz: Tuple[float, float],
                 goal_xz: Tuple[float, float],
                 resolution: float = 0.1) -> np.ndarray:
        """Shortest path on the traversability grid (replaces
        habitat_sim.ShortestPath, ref: env_base.py:13-72). Returns [K, 2]
        (x, z) waypoints in meters (empty if unreachable)."""
        from ..agents.planner import astar

        grid = self.traversability(resolution)

        def to_cell(p):
            return (int(np.clip(p[1] / resolution, 0, grid.shape[0] - 1)),
                    int(np.clip(p[0] / resolution, 0, grid.shape[1] - 1)))

        path = astar(grid, to_cell(start_xz), to_cell(goal_xz))
        if len(path) == 0:
            return np.zeros((0, 2), np.float32)
        return np.asarray([[(c + 0.5) * resolution, (r + 0.5) * resolution]
                           for r, c in path], np.float32)

    def get_semantic_annotations(self):
        """Scene object annotations (ref: env_habitat3.py
        get_semantic_annotations returns habitat scene objects)."""
        s = self.sim._scene_np
        out = []
        for i in range(len(s.valid)):
            if s.valid[i] and s.class_id[i] >= 0:
                out.append({
                    "instance_id": int(s.instance_id[i]),
                    "class_id": int(s.class_id[i]),
                    "aabb_min": s.box_min[i].tolist(),
                    "aabb_max": s.box_max[i].tolist(),
                })
        return out

    def object_disagreements(self) -> np.ndarray:
        return np.asarray(V.object_disagreement(self.map_state, self.cfg.map))
