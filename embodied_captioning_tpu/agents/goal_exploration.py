"""goalexplorationbaseline-v0: disagreement-driven RL exploration.

Parity with the reference's main trainer (ref: experimenting_env/agents/
goal_exploration/goal_exploration.py): per step, the perception program
detects+captions+embeds, the voxel map fuses and yields the disagreement
reward (sum/1000, ref: env_habitat3.py:75-84); a PPO "global policy" over
2x128x128 maps (resized disagreement map + topdown map with agent disc,
ref :156-211) + 72-bin orientation embedding emits an (x, y) in [0,1]^2 map
goal every `replanning_steps` (ref :222-571); goals become A* waypoint plans
followed by the SubGoalFollower. `train()` adds GAE + PPO updates every
`num_global_steps` decisions and periodic checkpoints (ref :783-1010);
`generate()` is the same loop without updates, writing npz observations
(ref :573-762).

Variants (ref: agents/goal_exploration/):
  -v1 delayed reward   reward granted only at the global decision boundary
  -v2 trajectory       cumulative trajectory reward for the whole window
  -v3 image-history    policy input stacks the last 4 map frames
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ExperimentConfig
from ..ops.image import resize_bilinear
from ..utils.profiling import PROFILER
from .baselines import _GoalDirectedTrainer
from .policy import act as policy_act
from .policy import init_policy
from .ppo import PPOState, create_state, ppo_update
from .registry import register_trainer
from .storage import RolloutStorage


def make_policy_inputs(topdown: np.ndarray, agent_xz: Tuple[float, float],
                       lower: np.ndarray, voxel_size: float,
                       map_size: int) -> np.ndarray:
    """[Z, X, 4] env maps -> [map_size, map_size, 2] policy input:
    ch0 = disagreement map, ch1 = topdown (obstacle 0.5 / explored 0.25) with
    the agent disc stamped at 1.0 (ref: goal_exploration.py:156-211)."""
    dis = topdown[..., 3]
    top = 0.5 * (topdown[..., 0] > 0.5) + 0.25 * (topdown[..., 1] > 0.5)
    r = int((agent_xz[1] - lower[2]) / voxel_size)
    c = int((agent_xz[0] - lower[0]) / voxel_size)
    rr, cc = np.ogrid[:top.shape[0], :top.shape[1]]
    disc = (rr - r) ** 2 + (cc - c) ** 2 <= 9
    top = np.where(disc, 1.0, top)
    stack = np.stack([dis, top], axis=-1).astype(np.float32)
    out = resize_bilinear(jnp.asarray(stack), map_size, map_size)
    return np.asarray(out)


def orientation_bin(yaw: float, bins: int = 72) -> int:
    deg = np.rad2deg(yaw) % 360.0
    return int(deg / (360.0 / bins)) % bins


@register_trainer("goalexplorationbaseline-v0")
class GoalExplorationTrainer(_GoalDirectedTrainer):
    REWARD_MODE = "delta"  # per-window disagreement delta

    RNN_DIM = 256  # GRU hidden width (agents/policy.init_gru)

    def __init__(self, cfg: ExperimentConfig, **kw):
        super().__init__(cfg, **kw)
        self.pcfg = cfg.policy
        self.g_params = init_policy(jax.random.PRNGKey(cfg.runtime.seed + 42),
                                    cfg.policy)
        self.ppo_state: PPOState = create_state(self.g_params, cfg.ppo)
        self._key = jax.random.PRNGKey(cfg.runtime.seed + 77)
        self._last_reward = np.zeros(self.envs.num_envs, np.float32)
        self._pending_goal: List[Optional[Tuple[float, float]]] = [
            None] * self.envs.num_envs
        self.metrics_log: List[Dict[str, float]] = []
        # recurrent trunk state (ref: utils/model.py NNBase GRU)
        self._rnn = (np.zeros((self.envs.num_envs, self.RNN_DIM), np.float32)
                     if cfg.policy.recurrent else None)
        ckpt = cfg.runtime.checkpoint_dir
        if ckpt and os.path.exists(os.path.join(ckpt, "policy.pkl")):
            self.load_checkpoint(os.path.join(ckpt, "policy.pkl"))

    # -- policy plumbing ---------------------------------------------------
    def _act(self, key, maps, orients, deterministic: bool = False):
        """One policy decision; advances the GRU state when recurrent.
        Returns (action, raw, log_prob, value, pre_rnn_state-or-None) — the
        PRE-step state is what PPO re-evaluates against."""
        m, o = jnp.asarray(maps), jnp.asarray(orients)
        if self._rnn is None:
            a, raw, lp, v = policy_act(self.ppo_state.params, key, m, o,
                                       deterministic=deterministic)
            return a, raw, lp, v, None
        pre = self._rnn.copy()
        a, raw, lp, v, h = policy_act(self.ppo_state.params, key, m, o,
                                      deterministic=deterministic,
                                      rnn_state=jnp.asarray(pre))
        self._rnn = np.asarray(h)
        return a, raw, lp, v, pre

    def _frame_obs(self):
        """Current-frame policy maps [E, S, S, 2] + orientation bins [E]."""
        maps, orients = [], []
        for env in self.envs.envs:
            td = env.get_and_update_disagreement_map()
            a = env.sim.agent
            maps.append(make_policy_inputs(
                td, (a.x, a.z), np.asarray(env.map_state.lower),
                self.cfg.map.voxel_size, self.pcfg.map_size))
            orients.append(orientation_bin(a.yaw, self.pcfg.orientation_bins))
        return np.stack(maps), np.asarray(orients, np.int32)

    def _policy_obs(self):
        return self._frame_obs()

    def _goals_from_actions(self, actions: np.ndarray) -> None:
        """(x, y) in [0,1]^2 -> world map goal -> A* plan
        (ref: goal_exploration.py:391-571 predict_new_goals + do_plan)."""
        for i, env in enumerate(self.envs.envs):
            lower = np.asarray(env.map_state.lower)
            gx = lower[0] + float(actions[i, 0]) * (
                self.cfg.map.grid[0] * self.cfg.map.voxel_size)
            gz = lower[2] + float(actions[i, 1]) * (
                self.cfg.map.grid[2] * self.cfg.map.voxel_size)
            gx = float(np.clip(gx, 0.3, self.cfg.sim.scene_size - 0.3))
            gz = float(np.clip(gz, 0.3, self.cfg.sim.scene_size - 0.3))
            self._pending_goal[i] = (gx, gz)
            self._plan_to(i, (gx, gz))

    def new_goal(self, i: int) -> Tuple[float, float]:
        if self._pending_goal[i] is not None:
            return self._pending_goal[i]
        size = self.cfg.sim.scene_size
        return (size / 2, size / 2)

    def _window_rewards(self) -> np.ndarray:
        cur = self.rewards()
        if self.REWARD_MODE == "delta":
            r = cur - self._last_reward
        else:
            r = cur
        self._last_reward = cur
        return r.astype(np.float32)

    # -- main loops --------------------------------------------------------
    def generate(self, num_steps: Optional[int] = None) -> List[str]:
        steps = num_steps or self.cfg.sim.episode_steps
        replan = self.cfg.ppo.replanning_steps
        obs = self.envs.observe()
        for t in range(steps):
            result = self.perceive_and_fuse(obs)
            if t % replan == 0:
                maps, orients = self._policy_obs()
                self._key, sub = jax.random.split(self._key)
                a, _, _, _, _ = self._act(sub, maps, orients)
                self._goals_from_actions(np.asarray(a))
            acts = self.actions(obs)
            self.envs.step_async(acts)         # sim t+1 overlaps obs writes
            self.save_step_obs(obs, result)
            obs, _, dones, infos = self.envs.step_wait()
            for i in np.flatnonzero(np.asarray(dones)):
                self.on_episode_reset(int(i))
            self._step += 1
        return sorted(self.saved_paths)

    def train(self, num_updates: int = 4,
              decisions_per_update: Optional[int] = None,
              fused: bool = False) -> List[Dict]:
        """PPO training: a global decision every `num_global_steps` env
        steps; a PPO update every `decisions_per_update` decisions
        (ref: goal_exploration.py:783-1010).

        fused=True runs each window's env+perception+fusion steps as ONE
        device launch (BaseTrainer.fused_window) — ~an order of magnitude
        more env steps per wall-second under tunnel per-RPC latency, which
        is what makes reference-scale PPO budgets (thousands of env steps,
        ref: gibson_goal_exploration.yaml:15,201-203) reachable on this
        rig. Requires num_global_steps | episode_steps; skips obs
        recording inside windows (training runs don't record)."""
        cfg = self.cfg
        window = cfg.ppo.num_global_steps
        if fused:
            assert cfg.sim.episode_steps % window == 0, (
                "fused training needs num_global_steps | episode_steps")
        horizon = decisions_per_update or 8
        storage = RolloutStorage(
            horizon, self.envs.num_envs, self.pcfg.map_size,
            self.pcfg.input_channels,
            rnn_dim=self.RNN_DIM if self._rnn is not None else 0)
        obs = self.envs.observe()
        maps, orients = self._policy_obs()
        storage.insert_obs(maps, orients)
        self._last_reward = self.rewards()

        for update in range(num_updates):
            with PROFILER.range("rollout"):
                for dec in range(horizon):
                    self._key, sub = jax.random.split(self._key)
                    a, raw, lp, v, pre_rnn = self._act(
                        sub, storage.maps[storage.t],
                        storage.orientation[storage.t])
                    self._goals_from_actions(np.asarray(a))
                    if fused:
                        win_done = self.fused_window(window)
                    else:
                        win_done = np.zeros(self.envs.num_envs, bool)
                        for _ in range(window):
                            result = self.perceive_and_fuse(obs)
                            acts = self.actions(obs)
                            self.envs.step_async(acts)
                            self.save_step_obs(obs, result)
                            obs, _, dones, infos = self.envs.step_wait()
                            win_done |= np.asarray(dones)
                            for i in np.flatnonzero(np.asarray(dones)):
                                self.on_episode_reset(int(i))
                            self._step += 1
                    rewards = self._window_rewards()
                    # episode boundaries: GAE must not bootstrap across a
                    # finished episode (mask 0 for windows that hit done —
                    # the env auto-resets, so obs is already the new
                    # episode), and the GRU state restarts for those envs
                    if self._rnn is not None:
                        # (np.where, not item assignment: _rnn may be a
                        # read-only view of a device array)
                        self._rnn = np.where(win_done[:, None], 0.0,
                                             self._rnn).astype(np.float32)
                    maps, orients = self._policy_obs()
                    storage.insert_step(
                        np.asarray(raw), np.asarray(lp), np.asarray(v),
                        rewards, (~win_done).astype(np.float32),
                        maps, orients, rnn_state=pre_rnn)
            with PROFILER.range("update"):
                # bootstrap + update (value-only query: don't advance the GRU)
                if self._rnn is None:
                    _, _, _, last_v = policy_act(
                        self.ppo_state.params, self._key,
                        jnp.asarray(storage.maps[-1]),
                        jnp.asarray(storage.orientation[-1]),
                        deterministic=True)
                else:
                    _, _, _, last_v, _ = policy_act(
                        self.ppo_state.params, self._key,
                        jnp.asarray(storage.maps[-1]),
                        jnp.asarray(storage.orientation[-1]),
                        deterministic=True, rnn_state=jnp.asarray(self._rnn))
                rollout = self._prepare_rollout(
                    storage.as_rollout(np.asarray(last_v)))
                self._key, sub = jax.random.split(self._key)
                self.ppo_state, metrics = ppo_update(self.ppo_state, rollout,
                                                     sub, cfg.ppo)
            self.metrics_log.append({k: float(v) for k, v in metrics.items()})
            storage.after_update()
            if self._after_update(update):
                break
        self._finalize_train()
        return self.metrics_log

    # -- hooks (DistributedPPOTrainer layers sharding/elastic-resume here;
    # keeping ONE rollout loop means fixes like done-masking reach both) ----
    def _prepare_rollout(self, rollout):
        return rollout

    def _after_update(self, update: int) -> bool:
        """Post-update bookkeeping; return True to stop training early."""
        cfg = self.cfg
        if (cfg.runtime.checkpoint_dir
                and (update + 1) % max(1, cfg.runtime.save_periodic) == 0):
            self.save_checkpoint()
        return False

    def _finalize_train(self) -> None:
        if self.cfg.runtime.checkpoint_dir:
            self.save_checkpoint()

    # -- checkpointing (ref: goal_exploration.py:999-1005, :652-659) -------
    def save_checkpoint(self, path: Optional[str] = None) -> str:
        path = path or os.path.join(self.cfg.runtime.checkpoint_dir,
                                    "policy.pkl")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        host = jax.tree_util.tree_map(np.asarray, self.ppo_state.params)
        with open(path, "wb") as fh:
            pickle.dump(host, fh)
        return path

    def load_checkpoint(self, path: str) -> None:
        with open(path, "rb") as fh:
            host = pickle.load(fh)
        params = jax.tree_util.tree_map(jnp.asarray, host)
        self.ppo_state = create_state(params, self.cfg.ppo)


@register_trainer("goalexplorationbaseline-v1")
class GoalExplorationDelayed(GoalExplorationTrainer):
    """Delayed reward variant (ref: goal_exploration_delayed.py:25-):
    absolute disagreement at the decision boundary instead of the delta."""

    REWARD_MODE = "absolute"


@register_trainer("goalexplorationbaseline-v2")
class GoalExplorationTrajectory(GoalExplorationTrainer):
    """Trajectory-cumulative reward (ref: goal_exploration_trajectory.py:25-70):
    sum of per-step deltas across the window — with our window bookkeeping
    this equals the window delta, granted undiscounted."""

    REWARD_MODE = "delta"


@register_trainer("goalexplorationbaseline-v3")
class GoalExplorationImageHistory(GoalExplorationTrainer):
    """Image-history variant (ref: goal_exploration/
    goal_exploration_trajectory_images.py:25-55): the policy input stacks the
    last HISTORY=4 (disagreement, topdown) map frames channel-wise, giving
    the CNN short-term temporal context (2*HISTORY input channels)."""

    HISTORY = 4
    REWARD_MODE = "delta"

    def __init__(self, cfg: ExperimentConfig, **kw):
        import dataclasses

        base_ch = cfg.policy.input_channels
        cfg = dataclasses.replace(
            cfg, policy=dataclasses.replace(
                cfg.policy, input_channels=base_ch * self.HISTORY))
        self._frames: Optional[List[np.ndarray]] = None
        super().__init__(cfg, **kw)

    def _policy_obs(self):
        maps, orients = self._frame_obs()
        if self._frames is None:
            self._frames = [maps] * self.HISTORY
        else:
            self._frames = self._frames[1:] + [maps]
        return np.concatenate(self._frames, axis=-1), orients
