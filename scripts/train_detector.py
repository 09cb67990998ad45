#!/usr/bin/env python
"""Teacher-student detector distillation pipeline CLI (ref: the reference's
hydra-driven `Pipeline` runs from confs/training/*.yaml presets,
ref: experimenting_env/pipelines.py:664-877 + scripts/run_exp.py)."""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--obs-dir", required=True,
                    help="exploration dataset dir (generated if missing)")
    ap.add_argument("--pipeline", default="default",
                    choices=["default", "online", "gt", "swa"])
    ap.add_argument("--consensus", default="soft",
                    choices=["vanilla", "soft", "majority", "max_score",
                             "semantic_map"])
    ap.add_argument("--head", default="focal",
                    choices=["ce", "focal", "soft", "softfocal", "msefocal"])
    ap.add_argument("--trainer", default="randombaseline")
    ap.add_argument("--preset", default="tiny")
    ap.add_argument("--rounds", type=int, default=1)
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--steps", type=int, default=None,
                    help="exploration steps when generating")
    ap.add_argument("--ema", action="store_true")
    ap.add_argument("--save", default=None, help="teacher/student pickle")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    from embodied_captioning_tpu.config import load_config
    from embodied_captioning_tpu.train.pipelines import (
        GTPipeline, OnlinePipeline, Pipeline, SWAPipeline,
    )

    cfg = load_config(args.preset, overrides=list(args.overrides))
    cls = {"default": Pipeline, "online": OnlinePipeline, "gt": GTPipeline,
           "swa": SWAPipeline}[args.pipeline]
    pipe = cls(cfg, trainer_name=args.trainer, consensus=args.consensus,
               head=args.head, use_ema=args.ema)

    all_logs = []
    for r in range(args.rounds):
        logs = pipe.run_round(args.obs_dir, num_steps=args.steps,
                              epochs=args.epochs)
        all_logs += logs
        print(f"[round {r}] {len(logs)} steps, "
              f"last loss={logs[-1]['loss']:.4f}" if logs else
              f"[round {r}] no batches", flush=True)
    if args.save:
        pipe.save(args.save)
    print(json.dumps({"rounds": args.rounds, "train_steps": len(all_logs),
                      "last": all_logs[-1] if all_logs else None,
                      "saved": args.save}))


if __name__ == "__main__":
    main()
