#!/usr/bin/env python
"""Caption annotated test boxes with a (fine-tuned) captioner -> results CSV
(ref: scripts/evaluate_finetuned_model.py:26-160 — loads a checkpoint,
captions each annotated box crop, writes proposed/reference CSV for
compute_performance_measures).

Annotations JSON: [{"image": path_or_store_ref, "box": [x1,y1,x2,y2],
"caption": "..."}]. `image` may be a path to an image npz/npy or
"exp_dir:episode:camera:step" into an obs store."""

import argparse
import csv
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_image(ref: str):
    import numpy as np

    if ":" in ref and not os.path.exists(ref):
        exp, ep, cam, step = ref.rsplit(":", 3)
        from embodied_captioning_tpu.utils.obs_store import SampleLoader

        return SampleLoader(exp).get_sample(int(ep), int(cam), "rgb",
                                            int(step)).data
    if ref.endswith(".npz"):
        return np.load(ref)["arr_0"]
    return np.load(ref)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("annotations", help="JSON list of image/box/caption")
    ap.add_argument("--checkpoint", default=None,
                    help="captioner params pickle (from fine-tuning)")
    ap.add_argument("--ported-dir", default=None,
                    help="ported real-checkpoint directory from "
                         "scripts/port_checkpoint.py (overrides --preset/"
                         "--checkpoint; uses the ported tokenizer + ids)")
    ap.add_argument("--preset", default="tiny")
    ap.add_argument("--out", default="captions_eval.csv")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from embodied_captioning_tpu.config import load_config
    from embodied_captioning_tpu.models.captioner import (
        generate, init_captioner, perplexity,
    )
    from embodied_captioning_tpu.models.tokenizer import default_tokenizer
    from embodied_captioning_tpu.ops.detections import expand_boxes
    from embodied_captioning_tpu.ops.image import crop_and_resize

    if args.ported_dir:
        # real ported checkpoint (scripts/port_checkpoint.py): params +
        # inferred config + the REAL tokenizer/ids travel together
        from embodied_captioning_tpu.tools.port import load_ported

        params, cfg, tok = load_ported(args.ported_dir)
        params = jax.tree_util.tree_map(jnp.asarray, params)
    else:
        cfg = load_config(args.preset,
                          overrides=list(args.overrides)).captioner
        if args.checkpoint:
            import pickle

            with open(args.checkpoint, "rb") as fh:
                params = jax.tree_util.tree_map(jnp.asarray,
                                                pickle.load(fh))
        else:
            params = init_captioner(jax.random.PRNGKey(0), cfg)
        tok = default_tokenizer(cfg.text.vocab_size)

    with open(args.annotations) as fh:
        anns = json.load(fh)

    rows = []
    for i in range(0, len(anns), args.batch):
        chunk = anns[i:i + args.batch]
        crops = []
        for a in chunk:
            img = _load_image(a["image"])
            h, w = img.shape[:2]
            box = expand_boxes(jnp.asarray([a["box"]], jnp.float32), 0.2,
                               h, w)
            crop = crop_and_resize(jnp.asarray(img, jnp.float32), box,
                                   cfg.vision.image_size)[0]
            crops.append(crop)
        batch_imgs = jnp.stack(crops).astype(jnp.uint8)
        toks, logits, _ = generate(params, batch_imgs, jax.random.PRNGKey(i),
                                   cfg)
        ppl = np.asarray(perplexity(logits, toks, pad_id=cfg.text.pad_id))
        for a, t, p in zip(chunk, np.asarray(toks), ppl):
            rows.append({"proposed": tok.decode(t),
                         "reference": a["caption"],
                         "perplexity": float(p)})

    with open(args.out, "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=["proposed", "reference",
                                           "perplexity"])
        w.writeheader()
        w.writerows(rows)
    print(json.dumps({"rows": len(rows), "out": args.out}))


if __name__ == "__main__":
    main()
