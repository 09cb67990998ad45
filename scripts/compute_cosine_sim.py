#!/usr/bin/env python
"""Multi-view caption consistency: mean pairwise sentence-embedding cosine
per (episode, object) (ref: scripts/compute_cosine_sim.py:11-22,156-203).

Reads captions from a recorded experiment's bbs npz payloads."""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# host-side evaluation: tiny models, CPU avoids per-process TPU compile costs
os.environ.setdefault("ECAP_PLATFORM", "cpu")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("exp_path")
    ap.add_argument("--preset", default="tiny")
    ap.add_argument("--min-views", type=int, default=2)
    ap.add_argument("--out", default=None, help="per-object json")
    args = ap.parse_args()

    import numpy as np

    from embodied_captioning_tpu.config import load_config
    from embodied_captioning_tpu.labeling.pseudocaptioner import (
        group_captions, records_from_store,
    )
    from embodied_captioning_tpu.models.sbert import SentenceEncoder
    from embodied_captioning_tpu.utils.metrics import mean_pairwise_cosine

    cfg = load_config(args.preset)
    enc = SentenceEncoder.create(0, cfg.sentence_encoder)
    groups = group_captions(records_from_store(args.exp_path))

    per_object = {}
    for (ep, obj), caps in groups.items():
        if len(caps) < args.min_views:
            continue
        emb = enc.encode(caps)
        per_object[f"{ep}_{obj}"] = {
            "views": len(caps),
            "mean_pairwise_cosine": mean_pairwise_cosine(emb),
        }
    values = [v["mean_pairwise_cosine"] for v in per_object.values()]
    summary = {
        "objects": len(per_object),
        "mean_consistency": float(np.mean(values)) if values else 0.0,
    }
    if args.out:
        with open(args.out, "w") as fh:
            json.dump({"per_object": per_object, "summary": summary}, fh,
                      indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
