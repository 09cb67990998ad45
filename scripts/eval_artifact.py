#!/usr/bin/env python
"""Eval-only harness for a trained serving artifact: protocol / wide /
stress corpora (VERDICT r4 weak #8 + missing #4).

Loads a pickle from scripts/selfcheck_detector.py --save (the committed
det_serving_256.pkl by default) and reports unseen-scene mAP@50 of the SAME
weights on:

  protocol  the 8-scene serving eval corpus (--eval-cache; the corpus the
            headline 0.825 +- 0.011 was measured on, checksum printed)
  wide      a 24-scene corpus at seed 100000 (eval-draw noise control)
  stress    a corpus at seed 200000 rendered with the sim's difficulty
            axes turned ON: distractor clutter objects (class -1, target-
            class palettes), extra occluding interior walls, boosted
            texture contrast (config.SimConfig stress fields). The
            reference's numbers live amid Gibson/HM3D clutter; this is the
            procedural analogue (ref: envs/sensors.py:237-512
            occlusion-discard GT semantics).

Per corpus: raw/EMA ("best") params and, when present, the as-served
artifact (affine-folded + int8), each with and without flip-TTA.
"""

import argparse
import dataclasses
import functools
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from selfcheck_detector import (collect, corpus_checksum, load_corpus,
                                save_corpus)


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifact", default=os.path.join(
        root, "embodied_captioning_tpu", "models", "data",
        "det_serving_256.pkl"))
    ap.add_argument("--eval-cache", default="/tmp/det_eval_serving_256px.npz")
    ap.add_argument("--wide", type=int, default=24)
    ap.add_argument("--wide-seed", type=int, default=100000)
    ap.add_argument("--wide-cache",
                    default="/tmp/det_eval_wide_serving_256px.npz")
    ap.add_argument("--stress", type=int, default=16)
    ap.add_argument("--stress-seed", type=int, default=200000)
    ap.add_argument("--stress-cache",
                    default="/tmp/det_eval_stress_256px.npz")
    ap.add_argument("--stress-distractors", type=int, default=6)
    ap.add_argument("--stress-walls", type=int, default=5)
    ap.add_argument("--stress-tex", type=float, default=0.18)
    ap.add_argument("--eval-ep-steps", type=int, default=12)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from embodied_captioning_tpu.config import apply_dotlist, load_config, merge
    from embodied_captioning_tpu.models import detector as DET
    from embodied_captioning_tpu.ops.detections import Detections
    from embodied_captioning_tpu.utils.metrics import evaluate_detections

    with open(args.artifact, "rb") as fh:
        artifact = pickle.load(fh)

    cfg = load_config("large", overrides=[
        "sensors.height=1280", "sensors.width=1280"])
    cfg = merge(cfg, {"detector": artifact["serving_cfg"]})
    if args.overrides:
        cfg = apply_dotlist(cfg, list(args.overrides))
    dcfg = cfg.detector
    eval_cfg = dataclasses.replace(dcfg, score_threshold=0.05)

    # ---- corpora ---------------------------------------------------------
    def get_corpus(path, scenes, seed0, stress=False):
        if path and os.path.exists(path):
            frames = load_corpus(path)
        else:
            c = cfg
            if stress:
                c = apply_dotlist(cfg, [
                    f"sim.num_distractors={args.stress_distractors}",
                    f"sim.interior_walls={args.stress_walls}",
                    f"sim.tex_boost={args.stress_tex}"])
            rng = np.random.default_rng(seed0)
            frames = collect(c, scenes, args.eval_ep_steps, seed0, rng)
            if path:
                save_corpus(path, frames)
        return frames

    corpora = {}
    corpora["protocol"] = get_corpus(args.eval_cache, 8, 500)
    if args.wide:
        corpora["wide"] = get_corpus(args.wide_cache, args.wide,
                                     args.wide_seed)
    if args.stress:
        corpora["stress"] = get_corpus(args.stress_cache, args.stress,
                                       args.stress_seed, stress=True)

    # ---- param variants --------------------------------------------------
    variants = {}  # name -> (params, norm override or None)
    if "params" in artifact:  # full save: raw/EMA f32 weights available
        best = (artifact.get("ema") if artifact.get("best") == "ema"
                else None) or artifact["params"]
        # raw/EMA weights were TRAINED under train_cfg's norm (gn) — the
        # serving_cfg may say affine (for the calibrated artifact); pick
        # the norm that matches the weights being evaluated
        train_norm = (artifact.get("train_cfg") or {}).get("norm", "gn")
        variants["best"] = (jax.tree_util.tree_map(jnp.asarray, best),
                            train_norm)
        if artifact.get("affine") is not None:
            variants["affine"] = (jax.tree_util.tree_map(
                jnp.asarray, artifact["affine"]), "affine")
    if "served" in artifact:  # compact export: as-served (folded + int8)
        variants["served_int8"] = (jax.tree_util.tree_map(
            jnp.asarray, artifact["served"]), None)

    def batch_of(frames, idx):
        images = jnp.asarray(np.stack([frames[i][0] for i in idx]))
        gt = jax.tree_util.tree_map(
            lambda *xs: jnp.stack([np.asarray(x) for x in xs]),
            *[frames[i][1] for i in idx])
        return images, gt

    def eval_map(params, frames, tta, cfg_):
        fwd = (functools.partial(DET.forward_tta, with_masks=False) if tta
               else functools.partial(DET.forward, with_masks=False))
        preds, gts = [], []
        for i in range(0, len(frames) - args.batch + 1, args.batch):
            images, gt = batch_of(frames, range(i, i + args.batch))
            det = fwd(params, images, cfg_)
            for b in range(images.shape[0]):
                preds.append(Detections(
                    boxes=det.boxes[b], classes=det.classes[b],
                    scores=det.scores[b], logits=det.logits[b],
                    valid=det.valid[b]))
                gts.append(jax.tree_util.tree_map(lambda x: x[b], gt))
        return round(evaluate_detections(preds, gts, dcfg.num_classes)
                     ["map"], 4)

    out = {"artifact": os.path.basename(args.artifact),
           "serving_img": dcfg.image_size,
           "artifact_metrics": artifact.get("metrics"),
           "corpora": {}, "results": {}}
    for cname, frames in corpora.items():
        out["corpora"][cname] = {"frames": len(frames),
                                 "sha": corpus_checksum(frames)}
        row = {}
        for vname, (params, norm) in variants.items():
            vcfg = (dataclasses.replace(eval_cfg, norm=norm)
                    if norm else eval_cfg)
            t0 = time.time()
            row[vname] = eval_map(params, frames, False, vcfg)
            row[vname + "_tta"] = eval_map(params, frames, True, vcfg)
            print(f"[eval] {cname}/{vname}: {row[vname]} "
                  f"(tta {row[vname + '_tta']}) {time.time() - t0:.0f}s",
                  flush=True)
        out["results"][cname] = row
    print(json.dumps(out))


if __name__ == "__main__":
    main()
