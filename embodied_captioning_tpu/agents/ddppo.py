"""Distributed PPO trainer ("myppo"): data-parallel PPO over a device mesh.

Parity with the reference's vendored habitat-baselines DDPPO trainer
(ref: experimenting_env/agents/ppo_trainer.py): `DDPPO if distributed else
PPO` (:174), `init_distrib_slurm` NCCL bring-up (:205), stats all-reduce
(:105-116, 557-569), profiling ranges around rollout/update (:401-422), and
elastic save_resume_state + SLURM requeue (:672-735).

TPU-native translation: one ("data",) mesh; rollout tensors are sharded over
"data" (env axis), params replicated, and the jit'd `ppo_update` runs SPMD —
XLA inserts the gradient all-reduce over ICI (the DDPPO allreduce). Multi-host
scaling uses the same code after `jax.distributed.initialize`
(parallel/mesh.py). Preemption/resume via utils.checkpoint.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config import ExperimentConfig
from ..parallel.mesh import make_mesh
from ..utils.checkpoint import CheckpointManager, PreemptionGuard
from ..utils.profiling import PROFILER
from .goal_exploration import GoalExplorationTrainer
from .ppo import ppo_update
from .registry import register_trainer
from .storage import Rollout


@register_trainer("myppo")
class DistributedPPOTrainer(GoalExplorationTrainer):
    """Goal-exploration PPO with the update sharded across all devices."""

    def __init__(self, cfg: ExperimentConfig, **kw):
        super().__init__(cfg, **kw)
        # pure data-parallel mesh over every available device
        self.mesh = make_mesh(shape=(len(jax.devices()),), axes=("data",))
        self._replicated = NamedSharding(self.mesh, P())
        # params replicated across the mesh
        self.ppo_state = jax.device_put(self.ppo_state, self._replicated)
        self.guard = PreemptionGuard(on_exit=self._requeue)
        self.guard.install()
        self.ckpt_mgr: Optional[CheckpointManager] = None
        self._update_idx = 0
        if cfg.runtime.checkpoint_dir:
            self.ckpt_mgr = CheckpointManager(
                os.path.join(cfg.runtime.checkpoint_dir, "ddppo"))
            self._maybe_resume()

    # -- elastic resume (ref: ppo_trainer.py:672-688 load_resume_state) ----
    def _maybe_resume(self) -> None:
        if self.ckpt_mgr and self.ckpt_mgr.latest_step() is not None:
            restored = self.ckpt_mgr.restore(
                jax.tree_util.tree_map(np.asarray, self.ppo_state))
            if restored is not None:
                self.ppo_state = jax.device_put(
                    jax.tree_util.tree_map(jnp.asarray, restored),
                    self._replicated)
                self._update_idx = int(self.ckpt_mgr.latest_step())

    def _save_resume_state(self) -> None:
        if self.ckpt_mgr:
            self.ckpt_mgr.save(self._update_idx, jax.tree_util.tree_map(
                np.asarray, self.ppo_state))

    def _requeue(self) -> None:
        """Preemption hook (ref: requeue_job :706-735): save resume state;
        a cluster scheduler hook can be attached via ECAP_REQUEUE_CMD."""
        self._save_resume_state()
        cmd = os.environ.get("ECAP_REQUEUE_CMD")
        if cmd:
            os.system(cmd)

    # -- sharded update ----------------------------------------------------
    def _shard_rollout(self, rollout: Rollout) -> Rollout:
        """Shard the env axis (axis 1) over "data"."""
        def place(x):
            if x is None:  # optional fields (e.g. rnn_states)
                return None
            x = jnp.asarray(x)
            if x.ndim >= 2 and x.shape[1] % self.mesh.shape["data"] == 0:
                spec = P(None, "data", *([None] * (x.ndim - 2)))
            else:
                spec = P()
            return jax.device_put(x, NamedSharding(self.mesh, spec))

        return Rollout(*[place(f) for f in rollout])

    def train(self, num_updates: int = 4, decisions_per_update=None):
        cfg = self.cfg
        window = cfg.ppo.num_global_steps
        horizon = decisions_per_update or 8
        from .storage import RolloutStorage

        storage = RolloutStorage(horizon, self.envs.num_envs,
                                 self.pcfg.map_size, self.pcfg.input_channels)
        obs = self.envs.observe()
        maps, orients = self._policy_obs()
        storage.insert_obs(maps, orients)
        self._last_reward = self.rewards()

        for update in range(num_updates):
            with PROFILER.range("rollout"):
                for dec in range(horizon):
                    self._key, sub = jax.random.split(self._key)
                    from .policy import act as policy_act

                    a, raw, lp, v = policy_act(
                        self.ppo_state.params, sub,
                        jnp.asarray(storage.maps[storage.t]),
                        jnp.asarray(storage.orientation[storage.t]))
                    self._goals_from_actions(np.asarray(a))
                    for _ in range(window):
                        result = self.perceive_and_fuse(obs)
                        self.save_step_obs(obs, result)
                        acts = self.actions(obs)
                        obs, _, dones, infos = self.envs.step(acts)
                        self._step += 1
                    rewards = self._window_rewards()
                    maps, orients = self._policy_obs()
                    storage.insert_step(
                        np.asarray(raw), np.asarray(lp), np.asarray(v),
                        rewards, np.ones(self.envs.num_envs, np.float32),
                        maps, orients)
            with PROFILER.range("update"):
                from .policy import act as policy_act

                _, _, _, last_v = policy_act(
                    self.ppo_state.params, self._key,
                    jnp.asarray(storage.maps[-1]),
                    jnp.asarray(storage.orientation[-1]),
                    deterministic=True)
                rollout = self._shard_rollout(
                    storage.as_rollout(np.asarray(last_v)))
                self._key, sub = jax.random.split(self._key)
                self.ppo_state, metrics = ppo_update(
                    self.ppo_state, rollout, sub, cfg.ppo)
            # cross-host stat reduction is implicit: metrics are replicated
            self.metrics_log.append({k: float(v) for k, v in metrics.items()})
            storage.after_update()
            self._update_idx += 1
            if self.ckpt_mgr and self._update_idx % max(
                    1, cfg.runtime.save_periodic) == 0:
                self._save_resume_state()
            if self.guard.should_exit:
                break
        self.guard.finalize()
        if self.ckpt_mgr:
            self._save_resume_state()
        return self.metrics_log
