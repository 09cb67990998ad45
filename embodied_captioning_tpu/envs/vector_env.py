"""Vectorized environment manager with a genuinely async step path.

Replaces habitat's fork+pipe `VectorEnv` RPC (ref: experimenting_env/utils/
habitat_utils.py:54-150 construct_envs; agents/baselines.py:74-91 async
step fan-out). The reference needs 20 worker processes because habitat-sim
renders on CPU/GPU per process; here rendering runs on the accelerator and
— when every env uses the stock EmbodiedEnv step/observe over a RaycastSim
— the whole batch renders in HBM-bounded chunked device launches
(`sim.render_batch_chunked`; one launch when the batch fits), instead of
paying per-env dispatch through the tunnel. Envs that override
step/observe (disagreement metrics, replay/viz) fall back to per-env calls.

Episodes auto-reset on done (habitat `auto_reset_done` contract): the obs
returned for a finished step is the NEXT episode's first observation, and
the done flag tells the agent where the boundary was.

Double-buffered pipeline (the BASELINE north star "the agent loop never
blocks on inference"): `step_async` hands the whole batch step to a worker
thread, which advances agent state on host and *dispatches* the next frame's
render to the device immediately — while the caller's thread blocks on the
current frame's perception readbacks and writes npz observations. Because
the worker mutates env state while the caller records frame t, `step_async`
snapshots each env's (pose, step, episode) first — `snapshot_at` is what
obs recording must read (live getters would race the in-flight step).
The `async_step_at` / `wait_step_at` per-index surface rides the same
machinery, so agent code written against habitat's API is truly
asynchronous here too.
"""

from __future__ import annotations

from concurrent.futures import Future, ThreadPoolExecutor
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ExperimentConfig
from .env import EmbodiedEnv
from .sim import RaycastSim, render_batch_chunked


class VectorEnv:
    def __init__(self, cfg: ExperimentConfig,
                 num_envs: Optional[int] = None):
        from .registry import make_env

        self.cfg = cfg
        n = num_envs or cfg.runtime.num_envs
        name = getattr(cfg.runtime, "env_name", "Habitat3Env")
        self.envs: List[EmbodiedEnv] = [make_env(name, cfg, env_id=i)
                                        for i in range(n)]
        # one worker: env stepping is serialized with itself (envs are
        # stateful), but overlaps with the caller's perception readbacks +
        # obs-store writes
        self._pool = ThreadPoolExecutor(max_workers=1,
                                        thread_name_prefix="vecenv")
        self._pending: Dict[int, Future] = {}
        self._batch_future: Optional[Future] = None
        self._snap: List[Optional[Dict[str, Any]]] = [None] * n

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

    # -- dispatch-time state snapshots --------------------------------------
    def _take_snapshot(self, index: int) -> None:
        env = self.envs[index]
        self._snap[index] = {
            "position": env.get_agent_position(),
            "step": env.get_step(),
            "episode_id": env.get_episode_id(),
        }

    def snapshot_at(self, index: int) -> Dict[str, Any]:
        """Pose/step/episode of env `index` as of the LAST step dispatch.
        Obs recorders must read this, not the live env getters: the worker
        thread mutates agent state while the caller writes frame t."""
        snap = self._snap[index]
        if snap is None:  # nothing dispatched yet: live reads are safe
            self._take_snapshot(index)
            snap = self._snap[index]
        return snap

    @staticmethod
    def _step_one(env: EmbodiedEnv, action: int):
        obs, r, d, info = env.step(int(action))
        if d:  # habitat auto_reset_done: next episode's first obs
            obs = env.reset()
        return obs, r, d, info

    def async_step_at(self, index: int, action: int) -> None:
        """Dispatch one env's step to the worker thread
        (ref: baselines.py:74-91 async_step_at/wait_step_at fan-out)."""
        self._take_snapshot(index)
        self._pending[index] = self._pool.submit(
            self._step_one, self.envs[index], int(action))

    def wait_step_at(self, index: int):
        fut = self._pending.pop(index, None)
        if fut is None:
            raise RuntimeError(
                f"wait_step_at({index}) without a matching async_step_at — "
                "the env would silently advance a frame the caller never "
                "requested")
        return fut.result()

    # -- batched stepping --------------------------------------------------
    def _batched_render_ok(self) -> bool:
        """One-launch rendering needs the stock step/observe (subclasses
        may add obs channels or per-step device work) over RaycastSims."""
        return all(type(e).step is EmbodiedEnv.step
                   and type(e).step_state is EmbodiedEnv.step_state
                   and type(e).observe is EmbodiedEnv.observe
                   and isinstance(e.sim, RaycastSim) for e in self.envs)

    def _step_all(self, actions: Sequence[int]):
        if self._batched_render_ok():
            rdi = [env.step_state(int(a))
                   for env, a in zip(self.envs, actions)]
            scenes = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *[e.sim.scene for e in self.envs])
            poses = jnp.stack(
                [jnp.asarray(e.sim.agent.camera_matrix(), jnp.float32)
                 for e in self.envs])
            s = self.envs[0].cfg.sensors
            out = render_batch_chunked(scenes, poses, s.height, s.width,
                               s.hfov_deg, s.max_depth)
            rewards = np.asarray([r for r, _, _ in rdi], np.float32)
            dones = np.asarray([d for _, d, _ in rdi], bool)
            infos = [i for _, _, i in rdi]
            if dones.any():  # auto-reset: done rows get the new episode
                obs_list = [{k: v[i] for k, v in out.items()}
                            for i in range(self.num_envs)]
                for i in np.flatnonzero(dones):
                    obs_list[int(i)] = self.envs[int(i)].reset()
                return self._stack(obs_list), rewards, dones, infos
            return dict(out), rewards, dones, infos
        outs = [self._step_one(env, a)
                for env, a in zip(self.envs, actions)]
        obs = self._stack([o[0] for o in outs])
        rewards = np.asarray([o[1] for o in outs], np.float32)
        dones = np.asarray([o[2] for o in outs], bool)
        infos = [o[3] for o in outs]
        return obs, rewards, dones, infos

    def step(self, actions: Sequence[int]):
        """Synchronous batch step; returns (obs dict, rewards, dones,
        infos)."""
        return self._step_all(actions)

    def step_async(self, actions: Sequence[int]) -> None:
        """Dispatch the whole batch step on the worker thread; overlap the
        next frame's simulation/render with the caller's current-frame
        work. Pair with `step_wait`. Snapshots every env's pose/step first
        (see `snapshot_at`)."""
        assert self._batch_future is None, "step_async already pending"
        for i in range(self.num_envs):
            self._take_snapshot(i)
        self._batch_future = self._pool.submit(self._step_all, list(actions))

    def step_wait(self):
        assert self._batch_future is not None, "no step_async pending"
        fut, self._batch_future = self._batch_future, None
        return fut.result()

    def reset(self):
        return self._stack([env.reset() for env in self.envs])

    def observe(self):
        return self._stack([env.observe() for env in self.envs])

    @staticmethod
    def _stack(obs_list: List[Dict[str, jnp.ndarray]]):
        return {k: jnp.stack([o[k] for o in obs_list])
                for k in obs_list[0]}

    def close(self) -> None:
        self._pool.shutdown(wait=False)
