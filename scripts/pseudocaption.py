#!/usr/bin/env python
"""LD-CPS: distill grouped multi-view captions into pseudo-captions
(ref: python -m experimenting_env.captioner.pseudocaptioner --method
llm|clip|blip2_itm|... , pseudocaptioner.py:485-514)."""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# host-side evaluation: tiny models, CPU avoids per-process TPU compile costs
os.environ.setdefault("ECAP_PLATFORM", "cpu")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("exp_path", help="recorded experiment dir with bbs npz")
    ap.add_argument("--method", default="sbert",
                    choices=["sbert", "clip", "itc", "tfidf", "llm"])
    ap.add_argument("--out", default="pseudo_captions.json")
    ap.add_argument("--preset", default="tiny")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    from embodied_captioning_tpu.config import load_config
    from embodied_captioning_tpu.labeling.pseudocaptioner import (
        PseudoCaptioner, group_captions, records_from_store,
    )

    cfg = load_config(args.preset, overrides=list(args.overrides))
    records = records_from_store(args.exp_path)
    groups = group_captions(records)
    print(f"[pseudocaption] {len(records)} captions over "
          f"{len(groups)} objects")
    pc = PseudoCaptioner(cfg, method=args.method)
    result = pc.consensus(groups)
    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps({"objects": len(result), "method": args.method,
                      "out": args.out}))


if __name__ == "__main__":
    main()
