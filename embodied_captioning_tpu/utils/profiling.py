"""Tracing / profiling utilities.

Replaces the reference's ad-hoc instrumentation — habitat profiling_wrapper
range push/pop around rollout/update phases (ref: experimenting_env/agents/
ppo_trainer.py:401-422) and wall-clock prints around raytracing
(ref: detector/pseudolabeler.py:766-776) — with:

- `RangeTimer`: named nested ranges with aggregate stats (the
  profiling_wrapper surface) usable as context manager or decorator
- `trace(path)`: JAX profiler trace context (XLA-level, viewable in
  TensorBoard/Perfetto)
- `device_timer`: block-until-ready wall timing for jit'd fns
"""

from __future__ import annotations

import contextlib
import functools
import time
from collections import defaultdict
from typing import Callable, Dict, List, Optional

import jax


class RangeTimer:
    """Named range aggregation: count / total / mean / max seconds."""

    def __init__(self) -> None:
        self.stats: Dict[str, List[float]] = defaultdict(list)
        self._stack: List[tuple] = []

    @contextlib.contextmanager
    def range(self, name: str):
        t0 = time.perf_counter()
        self._stack.append((name, t0))
        try:
            yield
        finally:
            self._stack.pop()
            self.stats[name].append(time.perf_counter() - t0)

    # habitat profiling_wrapper parity surface
    def range_push(self, name: str) -> None:
        self._stack.append((name, time.perf_counter()))

    def range_pop(self) -> None:
        name, t0 = self._stack.pop()
        self.stats[name].append(time.perf_counter() - t0)

    def wrap(self, name: str) -> Callable:
        def deco(fn):
            @functools.wraps(fn)
            def inner(*a, **kw):
                with self.range(name):
                    return fn(*a, **kw)

            return inner

        return deco

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, vals in self.stats.items():
            out[name] = {
                "count": len(vals),
                "total_s": round(sum(vals), 4),
                "mean_s": round(sum(vals) / len(vals), 4),
                "max_s": round(max(vals), 4),
            }
        return out

    def reset(self) -> None:
        self.stats.clear()


PROFILER = RangeTimer()  # process-global default, like profiling_wrapper


@contextlib.contextmanager
def trace(logdir: str):
    """XLA-level profiler trace (jax.profiler), TensorBoard-viewable."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_timer(fn: Callable, *args, iters: int = 1, **kwargs):
    """(result, seconds_per_call) with proper block_until_ready fencing."""
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return out, (time.perf_counter() - t0) / max(iters, 1)
