#!/usr/bin/env python
"""Caption quality vs annotated references: BLEU / METEOR / ROUGE-1/2/L +
sentence-embedding cosine (ref: scripts/compute_performance_measures.py:
10-96,136-186 — nltk/rouge/SBERT over a results CSV).

Input CSV columns: proposed,reference (header optional extra columns kept).
"""

import argparse
import csv
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# host-side evaluation: tiny models, CPU avoids per-process TPU compile costs
os.environ.setdefault("ECAP_PLATFORM", "cpu")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("csv_path")
    ap.add_argument("--proposed-col", default="proposed")
    ap.add_argument("--reference-col", default="reference")
    ap.add_argument("--preset", default="tiny")
    ap.add_argument("--out", default=None, help="per-row scores CSV")
    args = ap.parse_args()

    import numpy as np

    from embodied_captioning_tpu.config import load_config
    from embodied_captioning_tpu.models.sbert import SentenceEncoder
    from embodied_captioning_tpu.utils.metrics import caption_scores

    rows = []
    with open(args.csv_path) as fh:
        for row in csv.DictReader(fh):
            rows.append((row[args.proposed_col], row[args.reference_col]))
    if not rows:
        print(json.dumps({"error": "empty csv"}))
        return

    cfg = load_config(args.preset)
    enc = SentenceEncoder.create(0, cfg.sentence_encoder)
    props = [r[0] for r in rows]
    refs = [r[1] for r in rows]
    ep = enc.encode(props)
    er = enc.encode(refs)
    cos = np.sum(ep * er, axis=1)  # diag of proposed x reference

    per_row = []
    for (p, r), c in zip(rows, cos):
        s = caption_scores(p, r)
        s["sbert_cosine"] = float(c)
        per_row.append(s)

    agg = {k: float(np.mean([s[k] for s in per_row]))
           for k in per_row[0]}
    agg["n"] = len(per_row)
    if args.out:
        with open(args.out, "w", newline="") as fh:
            w = csv.DictWriter(fh, fieldnames=list(per_row[0]))
            w.writeheader()
            w.writerows(per_row)
    print(json.dumps(agg))


if __name__ == "__main__":
    main()
