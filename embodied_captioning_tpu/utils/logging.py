"""Metrics logging / observability.

Replaces the reference's wandb-everywhere pattern (ref: scripts/
run_exp.py:50-57 wandb.init(mode='disabled'), train_helpers.py:112-118
WandbLogger, goal_exploration.py:764-781 scalar logging) with a zero-dep
`MetricsLogger` that writes JSONL locally and mirrors to wandb when the
library is importable and enabled — same `log(dict, step)` surface.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Any, Dict, Optional

log = logging.getLogger("embodied_captioning_tpu")


class MetricsLogger:
    def __init__(self, out_dir: Optional[str] = None, run_name: str = "run",
                 use_wandb: bool = False, wandb_project: str =
                 "embodied-captioning-tpu"):
        self.out_dir = out_dir
        self._fh = None
        self._step = 0
        self._wandb = None
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            self._fh = open(os.path.join(out_dir, f"{run_name}.jsonl"), "a")
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(project=wandb_project, name=run_name,
                           mode=os.environ.get("WANDB_MODE", "disabled"))
            except Exception:
                self._wandb = None

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None) -> None:
        step = self._step if step is None else step
        self._step = step + 1
        row = {"step": step, "time": time.time(), **metrics}
        if self._fh:
            self._fh.write(json.dumps(row) + "\n")
            self._fh.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)
        log.info("step %d: %s", step,
                 {k: v for k, v in metrics.items() if not isinstance(v, str)})

    def close(self) -> None:
        if self._fh:
            self._fh.close()
        if self._wandb is not None:
            self._wandb.finish()
