#!/usr/bin/env python
"""Pseudo-label a recorded exploration dataset (ref: scripts/
run_pseudolabeler.py:69-112 — SemanticMapConsensusCaptioner.predict +
get_pseudo_labels over a saved experiment)."""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("exp_path")
    ap.add_argument("--out", required=True, help="pseudo-label output dir")
    ap.add_argument("--consensus", default="semantic_map",
                    choices=["vanilla", "soft", "majority", "max_score",
                             "semantic_map", "semantic_map_captioner"])
    ap.add_argument("--preset", default="tiny")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    from embodied_captioning_tpu.config import load_config
    from embodied_captioning_tpu.labeling.datasets import (
        EpisodeDetectionDataset,
    )
    from embodied_captioning_tpu.labeling.pseudolabeler import (
        CONSENSUS_REGISTRY,
    )

    cfg = load_config(args.preset, overrides=list(args.overrides))
    labeler = CONSENSUS_REGISTRY[args.consensus](cfg)
    dataset = EpisodeDetectionDataset(args.exp_path, label_modality="bbs",
                                      with_depth_pose=True)
    print(f"[pseudolabeler] {len(dataset)} frames, consensus="
          f"{args.consensus}")
    preds = labeler.predict(dataset, args.batch)
    pseudo = labeler.get_pseudo_labels(preds)
    paths = labeler.save_pseudo_labels(pseudo, args.out)
    import numpy as np

    n_inst = int(sum(p.valid.sum() for p in pseudo))
    print(json.dumps({"frames": len(pseudo), "instances": n_inst,
                      "files": len(paths), "out": args.out}))


if __name__ == "__main__":
    main()
