#!/usr/bin/env python
"""Detection statistics over a recorded experiment (ref: scripts/
compute_detection_statistics.py:1-240): per-class counts, score histograms,
and mAP of `bbs` predictions vs `bbsgt` labels where both exist."""

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
    args = ap.parse_args()

    import numpy as np

    from embodied_captioning_tpu.config import CLASS_NAMES, NUM_CLASSES
    from embodied_captioning_tpu.utils.obs_store import SampleLoader
    from embodied_captioning_tpu.utils.metrics import average_precision

    loader = SampleLoader(args.exp_path)
    counts = np.zeros(NUM_CLASSES, np.int64)
    scores = []
    pb, ps, pc, gb, gc = [], [], [], [], []
    for ep in loader.episodes:
        for cam in loader.cameras(ep):
            mods = loader.modalities(ep, cam)
            if "bbs" not in mods:
                continue
            gt_cam = None
            for c2 in loader.cameras(ep):
                if "bbsgt" in loader.modalities(ep, c2):
                    gt_cam = c2
                    break
            for step in loader.steps(ep, cam, "bbs"):
                d = loader.get_sample(ep, cam, "bbs", step).data
                v = np.asarray(d.get("valid", []), bool)
                if v.size == 0:
                    continue
                cls = np.asarray(d["classes"])[v]
                for c in cls:
                    if 0 <= c < NUM_CLASSES:
                        counts[c] += 1
                scores += list(np.asarray(d.get("scores",
                                                np.ones(v.sum())))[v])
                if gt_cam is not None and step in loader.paths[ep][gt_cam][
                        "bbsgt"]:
                    g = loader.get_sample(ep, gt_cam, "bbsgt", step).data
                    gv = np.asarray(g.get("valid", []), bool)
                    pb.append(np.asarray(d["boxes"])[v])
                    ps.append(np.asarray(d.get("scores",
                                               np.ones(v.sum())))[v])
                    pc.append(cls)
                    gb.append(np.asarray(g["boxes"])[gv])
                    gc.append(np.asarray(g["classes"])[gv])

    out = {
        "detections_per_class": {CLASS_NAMES[i]: int(counts[i])
                                 for i in range(NUM_CLASSES)},
        "total": int(counts.sum()),
        "mean_score": float(np.mean(scores)) if scores else 0.0,
    }
    if pb:
        out["map_50"] = average_precision(pb, ps, pc, gb, gc,
                                          NUM_CLASSES)["map"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
