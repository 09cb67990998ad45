"""Vectorized environment manager.

Replaces habitat's fork+pipe `VectorEnv` RPC (ref: experimenting_env/utils/
habitat_utils.py:54-150 construct_envs; agents/baselines.py:74-91 async
step fan-out). The reference needs 20 worker processes because habitat-sim
renders on CPU/GPU per process; here rendering is a batched jit on the
accelerator, so a single-process manager steps every env and renders the
whole batch in one device launch. The `call_at` / `async_step_at` surface is
kept so agent code ports 1:1.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ExperimentConfig
from .env import EmbodiedEnv


class VectorEnv:
    def __init__(self, cfg: ExperimentConfig,
                 num_envs: Optional[int] = None):
        from .registry import make_env

        self.cfg = cfg
        n = num_envs or cfg.runtime.num_envs
        name = getattr(cfg.runtime, "env_name", "Habitat3Env")
        self.envs: List[EmbodiedEnv] = [make_env(name, cfg, env_id=i)
                                        for i in range(n)]
        self._pending: Dict[int, int] = {}

    @property
    def num_envs(self) -> int:
        return len(self.envs)

    # -- habitat-parity RPC ------------------------------------------------
    def call_at(self, index: int, method: str, kwargs: Optional[dict] = None):
        """(ref: agents use envs.call_at(i, "update_pointcloud", {...}))"""
        return getattr(self.envs[index], method)(**(kwargs or {}))

    def call(self, method: str, kwargs_list: Optional[List[dict]] = None):
        kwargs_list = kwargs_list or [{}] * self.num_envs
        return [self.call_at(i, method, kw)
                for i, kw in enumerate(kwargs_list)]

    def async_step_at(self, index: int, action: int) -> None:
        self._pending[index] = int(action)

    def wait_step_at(self, index: int):
        action = self._pending.pop(index, 0)
        return self.envs[index].step(action)

    # -- batched stepping --------------------------------------------------
    def step(self, actions: Sequence[int]):
        """Step all envs; returns (obs_batch dict of stacked arrays,
        rewards, dones, infos)."""
        outs = [env.step(int(a)) for env, a in zip(self.envs, actions)]
        obs = self._stack([o[0] for o in outs])
        rewards = np.asarray([o[1] for o in outs], np.float32)
        dones = np.asarray([o[2] for o in outs], bool)
        infos = [o[3] for o in outs]
        return obs, rewards, dones, infos

    def reset(self):
        return self._stack([env.reset() for env in self.envs])

    def observe(self):
        return self._stack([env.observe() for env in self.envs])

    @staticmethod
    def _stack(obs_list: List[Dict[str, jnp.ndarray]]):
        return {k: jnp.stack([o[k] for o in obs_list])
                for k in obs_list[0]}

    def close(self) -> None:
        pass
