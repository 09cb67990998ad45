#!/usr/bin/env python
"""Violin plots of per-object caption-consistency distributions across
experiment variants (ref: scripts/visualize_cosine_similarity.py and
visualize_policy_cosine_similarity.py — the paper's
gibson_coca_finetuning_violin figures).

Input: one or more per-object JSON files produced by
`scripts/compute_cosine_sim.py --out ...`, each labeled `name=path`
(bare paths use the file stem). Output: a PNG of violins, one per variant.

    python scripts/visualize_cosine_similarity.py \
        baseline=va.json finetuned=vb.json --out violins.png
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_values(path: str):
    with open(path) as fh:
        d = json.load(fh)
    per_object = d.get("per_object", d)
    return [v["mean_pairwise_cosine"] for v in per_object.values()]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("inputs", nargs="+", help="name=path or path JSONs from "
                    "compute_cosine_sim --out")
    ap.add_argument("--out", default="cosine_violins.png")
    ap.add_argument("--title", default="Multi-view caption consistency "
                    "(mean pairwise SBERT cosine per object)")
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")  # headless
    import matplotlib.pyplot as plt
    import numpy as np

    names, series = [], []
    for item in args.inputs:
        name, _, path = item.rpartition("=")
        path = path or item
        name = name or os.path.splitext(os.path.basename(path))[0]
        vals = load_values(path)
        if not vals:
            print(f"[visualize] {name}: no objects, skipped")
            continue
        names.append(name)
        series.append(np.asarray(vals))

    if not series:
        print(json.dumps({"error": "no data"}))
        return

    fig, ax = plt.subplots(figsize=(1.8 + 1.6 * len(series), 4.0))
    parts = ax.violinplot(series, showmeans=True, showextrema=True)
    ax.set_xticks(range(1, len(names) + 1))
    ax.set_xticklabels(names, rotation=15)
    ax.set_ylabel("mean pairwise cosine")
    ax.set_ylim(-0.05, 1.05)
    ax.set_title(args.title, fontsize=10)
    ax.grid(axis="y", alpha=0.3)
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(json.dumps({
        "out": args.out,
        "variants": {n: {"objects": int(len(s)), "mean": float(s.mean()),
                         "median": float(np.median(s))}
                     for n, s in zip(names, series)},
    }))


if __name__ == "__main__":
    main()
