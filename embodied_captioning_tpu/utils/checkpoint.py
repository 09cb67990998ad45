"""Checkpoint / resume / preemption handling (orbax-backed).

Replaces the reference's checkpoint stack — PL ModelCheckpoint
(ref: experimenting_env/utils/train_helpers.py:52-60), pipeline resume
(ref: pipelines.py:838-858), RL torch.save (ref: goal_exploration.py:999-1005)
and the DDPPO save_resume_state + SLURM requeue
(ref: agents/ppo_trainer.py:672-735) — with one orbax CheckpointManager
wrapper that snapshots arbitrary pytrees (params, opt state, counters,
python metadata) and restores elastically.
"""

from __future__ import annotations

import json
import os
import signal
import threading
from typing import Any, Callable, Dict, Optional

import jax
import numpy as np


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, step: int, state: Any,
             metadata: Optional[Dict] = None) -> None:
        import orbax.checkpoint as ocp

        args = ocp.args.Composite(
            state=ocp.args.StandardSave(state),
            **({"metadata": ocp.args.JsonSave(metadata)} if metadata else {}),
        )
        self._mgr.save(step, args=args)
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None,
                with_metadata: bool = False) -> Any:
        """Restore the state pytree; `with_metadata=True` returns
        (state, metadata-dict-or-None) so whatever `save(metadata=...)`
        recorded (counters, python config) survives the round trip."""
        import orbax.checkpoint as ocp

        step = step if step is not None else self.latest_step()
        if step is None:
            return (None, None) if with_metadata else None
        restored = self._mgr.restore(
            step, args=ocp.args.Composite(
                state=ocp.args.StandardRestore(state_template)))
        if not with_metadata:
            return restored["state"]
        meta = None
        try:
            meta = self._mgr.restore(
                step, args=ocp.args.Composite(
                    metadata=ocp.args.JsonRestore()))["metadata"]
        except Exception:
            pass  # checkpoint saved without metadata
        return restored["state"], meta

    def close(self) -> None:
        self._mgr.close()


class PreemptionGuard:
    """SIGTERM-aware training guard (the DDPPO requeue analog,
    ref: ppo_trainer.py:706-735): on SIGTERM/SIGUSR1 sets a flag; the train
    loop checks `should_exit` and saves resume state before exiting. The
    `on_exit` hook is where a cluster requeue command would go."""

    def __init__(self, on_exit: Optional[Callable[[], None]] = None):
        self.should_exit = False
        self._on_exit = on_exit
        self._installed = False

    def install(self) -> None:
        if self._installed:
            return
        if threading.current_thread() is not threading.main_thread():
            return

        def handler(signum, frame):
            self.should_exit = True

        for sig in (signal.SIGTERM, signal.SIGUSR1):
            try:
                signal.signal(sig, handler)
            except (ValueError, OSError):
                pass
        self._installed = True

    def finalize(self) -> None:
        if self.should_exit and self._on_exit:
            self._on_exit()
