"""Named environment registry + reward-variant envs.

Parity with the reference's habitat-registered env names (ref:
experimenting_env/envs/): `Habitat3Env` (env_habitat3.py:19 — the main
config's env), `GymHabitatEnv-v2` (env_gym_habitat.py:22),
`SemanticDisagreement-v0` (env_semanticmap_disagreement.py:24),
`SemanticDisagreement-kl` (env_semantic_disagreement_kl.py:24), and the
replay/visualization envs `Viz-v0/v1` (env_viz.py:20,234). All share the
EmbodiedEnv core; variants change the reward function or the frame source.
"""

from __future__ import annotations

from typing import Dict, Optional, Type

import jax.numpy as jnp
import numpy as np

from ..config import ExperimentConfig
from ..mapping import voxel_map as V
from .env import EmbodiedEnv

ENV_REGISTRY: Dict[str, Type] = {}


def register_env(name: str):
    def deco(cls):
        ENV_REGISTRY[name] = cls
        return cls

    return deco


def make_env(name: str, cfg: ExperimentConfig, env_id: int = 0,
             **kw) -> EmbodiedEnv:
    if name not in ENV_REGISTRY:
        raise KeyError(f"unknown env {name!r}; known: "
                       f"{sorted(ENV_REGISTRY)}")
    return ENV_REGISTRY[name](cfg, env_id=env_id, **kw)


# main env (disagreement-sum reward)
register_env("Habitat3Env")(EmbodiedEnv)


@register_env("GymHabitatEnv-v2")
class GymHabitatEnvV2(EmbodiedEnv):
    """Older wrapper variant with the DisagreementUtil surface
    (ref: env_gym_habitat.py:22-181): objectnav `get_distance` — distance to
    the nearest topdown-semantic cell of the goal class, 10.0 when the class
    has never been mapped — plus a greedy goal follower
    (`set_goals` / `get_action_to_goal`)."""

    NO_GOAL_DISTANCE = 10.0  # ref: env_gym_habitat.py:91

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        from ..agents.baselines import SubGoalFollower

        self._follower = SubGoalFollower(self.cfg.sim.turn_angle_deg)
        self._v2_goal = None

    def get_distance(self, object_class: int) -> float:
        """Distance from the agent to the nearest mapped cell of
        `object_class` on the topdown semantic channel (class + 1 coding,
        ref: env_gym_habitat.py:71-108)."""
        maps = np.asarray(self.get_and_update_disagreement_map())
        cells = np.argwhere(maps[..., 2] == object_class + 1)  # [K, (z, x)]
        if cells.size == 0:
            return self.NO_GOAL_DISTANCE
        lower = np.asarray(self.map_state.lower)
        vox = self.cfg.map.voxel_size
        world = np.stack([lower[0] + (cells[:, 1] + 0.5) * vox,
                          lower[2] + (cells[:, 0] + 0.5) * vox], axis=-1)
        a = self.sim.agent
        return float(np.min(np.hypot(world[:, 0] - a.x, world[:, 1] - a.z)))

    def set_goals(self, goals) -> None:
        self._v2_goal = goals

    def get_action_to_goal(self):
        """(action, goal_reached) greedy step toward the current goal;
        turns in place while no goal is set (ref: env_gym_habitat.py:152-178
        greedy follower, act=2 with no goal, act=0 => reached)."""
        if self._v2_goal is None:
            return 2, False
        a = self.sim.agent
        act = self._follower.act((a.x, a.z), a.yaw, tuple(self._v2_goal))
        return act, act == 0


@register_env("SemanticDisagreement-v0")
class SemanticDisagreementEnv(EmbodiedEnv):
    """Adds exploration metrics: `area_ratio` of explored map cells
    (fog-of-war coverage, ref: env_semanticmap_disagreement.py:68-99)."""

    def area_ratio(self) -> float:
        maps = self.get_and_update_disagreement_map()
        explored = float((maps[..., 1] > 0.5).sum())
        # free-space denominator from the traversability grid
        trav = self.traversability(0.1)
        vox = self.cfg.map.voxel_size
        total_free = float(trav.sum()) * (0.1 / vox) ** 2
        return explored / max(total_free, 1.0)

    def step(self, action):
        obs, r, done, info = super().step(action)
        info["area_ratio"] = self.area_ratio()
        return obs, r, done, info


@register_env("SemanticDisagreement-kl")
class SemanticDisagreementKLEnv(SemanticDisagreementEnv):
    """Reward = summed KL between current detections and the map's
    consensus (ref: env_semantic_disagreement_kl.py:24-158 plugs a KL
    distance into the pcd). Call `set_last_frame` with each step's
    detections before `get_reward`."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self._last = None

    def set_last_frame(self, detections, depth, pose) -> None:
        self._last = (detections, depth, pose)

    def get_reward(self) -> float:
        if self._last is None:
            return 0.0
        det, depth, pose = self._last
        return self.get_kl_reward(det, jnp.asarray(depth),
                                  jnp.asarray(pose))


@register_env("Viz-v0")
class VizEnv(EmbodiedEnv):
    """Replay env: frames come from a recorded npz experiment instead of the
    simulator (ref: env_viz.py:20; the reference's replay/visualization
    path). Uses cfg.sim.replay_dir."""

    def __init__(self, cfg: ExperimentConfig, env_id: int = 0, **kw):
        from ..utils.obs_store import SampleLoader

        assert cfg.sim.replay_dir, "Viz-v0 needs sim.replay_dir"
        self.loader = SampleLoader(cfg.sim.replay_dir)
        eps = self.loader.episodes
        self._replay_episode = eps[env_id % len(eps)]
        # the store schema assigns one camera id PER MODALITY (save_obs
        # enumeration order), so rgb is not necessarily camera 0
        self._rgb_cam = self.loader.camera_of(self._replay_episode, "rgb")
        if self._rgb_cam is None:
            raise ValueError(
                f"replay dir {cfg.sim.replay_dir} episode "
                f"{self._replay_episode} has no rgb modality")
        self._steps = self.loader.steps(self._replay_episode, self._rgb_cam,
                                        "rgb")
        self._cursor = 0
        super().__init__(cfg, env_id=env_id, **kw)

    def reset(self):
        # rewind FIRST: the base reset ends with observe(), which routes
        # through our replay observe — resetting after it would load the
        # stale pre-reset frame just to throw it away
        self._cursor = 0
        return super().reset()

    def observe(self):
        if not hasattr(self, "loader"):
            return super().observe()
        step = self._steps[min(self._cursor, len(self._steps) - 1)]
        ep = self._replay_episode
        rgb = self.loader.get_sample(ep, self._rgb_cam, "rgb", step).data
        out = {"rgb": jnp.asarray(rgb)}
        for cam in self.loader.cameras(ep):
            mods = self.loader.modalities(ep, cam)
            if "depth" in mods and step in self.loader.paths[ep][cam]["depth"]:
                out["depth"] = jnp.asarray(
                    self.loader.get_sample(ep, cam, "depth", step).data)
        if "depth" not in out:
            out["depth"] = jnp.zeros(rgb.shape[:2], jnp.float32)
        out["instances"] = jnp.full(rgb.shape[:2], -1, jnp.int32)
        out["classes"] = jnp.full(rgb.shape[:2], -1, jnp.int32)
        return out

    def step(self, action):
        self._cursor += 1
        self.step_count += 1
        done = self._cursor >= len(self._steps)
        return self.observe(), 0.0, done, {"replay_step": self._cursor}


@register_env("Viz-v1")
class VizTrajectoryEnv(VizEnv):
    """SEAL-style replay visualization (ref: env_viz.py:234-412 VizSEAL):
    on top of Viz-v0's npz frame replay it (1) attaches the
    class-normalized top-down semantic map to observations as 'pcd' (the
    reference's `pcd.current_connected_pcd / len(BBSense.CLASSES)`),
    (2) tracks the agent trajectory from the RECORDED positions, and
    (3) writes a per-step top-down trajectory frame trajectory_%04d.png
    (the reference's maps.colorize_draw_agent... + cv2.imwrite,
    ref: env_viz.py:292-330)."""

    def __init__(self, cfg: ExperimentConfig, env_id: int = 0, **kw):
        import os

        # set before super().__init__ — the base constructor resets, which
        # routes through our overridden reset/_augment
        self._traj_cells = []
        out = cfg.runtime.obs_dir or cfg.sim.replay_dir
        self._viz_dir = os.path.join(out, "viz")
        super().__init__(cfg, env_id=env_id, **kw)

    def reset(self):
        obs = super().reset()
        self._traj_cells = []
        return self._augment(obs)

    def _position_cell(self):
        """Map-grid (row=z, col=x) cell of the RECORDED agent position for
        the current replay step, if a position modality was stored."""
        ep = self._replay_episode
        step = self._steps[min(self._cursor, len(self._steps) - 1)]
        for cam in self.loader.cameras(ep):
            mods = self.loader.paths[ep][cam]
            if "position" in mods and step in mods["position"]:
                data = self.loader.get_sample(ep, cam, "position", step).data
                pos = np.asarray(data.position if hasattr(data, "position")
                                 else data["position"], np.float64)
                _, lower = self.get_upper_and_lower_map_bounds()
                res = self.cfg.map.voxel_size
                return (int((pos[2] - lower[2]) / res),
                        int((pos[0] - lower[0]) / res))
        return None

    def _augment(self, obs):
        import os

        from ..config import NUM_CLASSES
        from ..utils.image_io import render_topdown, write_png

        maps = self.get_and_update_disagreement_map()  # [Z, X, 4]
        cell = self._position_cell()
        if cell is not None:
            self._traj_cells.append(cell)
        img = render_topdown(np.asarray(maps), self._traj_cells, cell)
        os.makedirs(self._viz_dir, exist_ok=True)
        write_png(os.path.join(self._viz_dir,
                               f"trajectory_{self.step_count:04d}.png"), img)
        obs["pcd"] = np.asarray(maps[..., 2], np.float32) / NUM_CLASSES
        return obs

    def step(self, action):
        obs, reward, done, info = super().step(action)
        return self._augment(obs), reward, done, info
