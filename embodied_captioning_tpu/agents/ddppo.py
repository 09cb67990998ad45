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
from .goal_exploration import GoalExplorationTrainer
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

    # -- training: the parent's rollout loop (incl. recurrent-policy state,
    # done-masked GAE, and double-buffered env stepping) with the
    # distributed deltas layered through the hooks -------------------------
    def _prepare_rollout(self, rollout: Rollout) -> Rollout:
        return self._shard_rollout(rollout)

    def _after_update(self, update: int) -> bool:
        # cross-host stat reduction is implicit: metrics are replicated
        self._update_idx += 1
        if self.ckpt_mgr and self._update_idx % max(
                1, self.cfg.runtime.save_periodic) == 0:
            self._save_resume_state()
        return self.guard.should_exit

    def _finalize_train(self) -> None:
        self.guard.finalize()
        if self.ckpt_mgr:
            self._save_resume_state()
