#!/usr/bin/env python
"""Run an exploration experiment (ref: scripts/run_exp.py:24-62 — hydra main
-> registry trainer -> .train()/.generate()).

Usage:
  python scripts/run_exp.py --trainer randombaseline --mode generate \
      --preset tiny --steps 20 [key.path=value ...]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trainer", default="goalexplorationbaseline-v0")
    ap.add_argument("--mode", choices=["train", "generate"],
                    default="generate")
    ap.add_argument("--preset", default="tiny")
    ap.add_argument("--config", default=None, help="YAML overlay path")
    ap.add_argument("--steps", type=int, default=None,
                    help="env steps for generate / updates for train")
    ap.add_argument("--obs-dir", default=None)
    ap.add_argument("overrides", nargs="*", help="a.b.c=value overrides")
    args = ap.parse_args()

    from embodied_captioning_tpu.config import load_config
    from embodied_captioning_tpu.agents.registry import get_trainer
    import embodied_captioning_tpu.agents.baselines  # noqa: F401 (registry)
    import embodied_captioning_tpu.agents.goal_exploration  # noqa: F401
    import embodied_captioning_tpu.agents.extra_trainers  # noqa: F401
    import embodied_captioning_tpu.agents.ddppo  # noqa: F401

    overrides = list(args.overrides)
    if args.obs_dir:
        overrides.append(f"runtime.obs_dir={args.obs_dir}")
    cfg = load_config(args.preset, yaml_path=args.config, overrides=overrides)

    t0 = time.time()
    trainer = get_trainer(args.trainer)(cfg)
    print(f"[run_exp] trainer={args.trainer} mode={args.mode} "
          f"preset={args.preset} init={time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    if args.mode == "generate":
        paths = trainer.generate(args.steps)
        dt = time.time() - t0
        n_frames = (args.steps or cfg.sim.episode_steps) * cfg.runtime.num_envs
        print(json.dumps({
            "mode": "generate", "saved_files": len(paths),
            "frames": n_frames, "seconds": round(dt, 2),
            "fps": round(n_frames / max(dt, 1e-6), 2),
            "rewards": [float(r) for r in trainer.rewards()],
        }))
    else:
        metrics = trainer.train(args.steps or 2)
        print(json.dumps({"mode": "train", "updates": len(metrics),
                          "metrics": metrics[-3:],
                          "seconds": round(time.time() - t0, 2)}))


if __name__ == "__main__":
    main()
