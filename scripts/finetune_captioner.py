#!/usr/bin/env python
"""Captioner fine-tuning CLI: CE + contrastive + triplet on pseudo-captioned
crops (replaces the reference's external fine-tune forks driven by
scripts/training_mpirun_coca.sh / training_mpirun.sh — open_clip
--coca-triplet-loss-weight and hf-transformers finetune_models_wandb)."""

import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("exp_path", help="recorded experiment with bbs npz")
    ap.add_argument("--pseudo-captions", default=None,
                    help="pseudo_captions.json from scripts/pseudocaption.py"
                         " (fallback: per-view captions from the store)")
    ap.add_argument("--preset", default="tiny")
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--triplet-weight", type=float, default=0.1)
    ap.add_argument("--save", default="captioner_finetuned.pkl")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from embodied_captioning_tpu.config import load_config
    from embodied_captioning_tpu.labeling.datasets import (
        EpisodeDetectionDataset,
    )
    from embodied_captioning_tpu.models.captioner import init_captioner
    from embodied_captioning_tpu.models.tokenizer import default_tokenizer
    from embodied_captioning_tpu.ops.detections import expand_boxes
    from embodied_captioning_tpu.ops.image import crop_and_resize
    from embodied_captioning_tpu.train.captioner_train import (
        create_train_state, train_step,
    )

    cfg = load_config(args.preset, overrides=list(args.overrides))
    ccfg = cfg.captioner
    tok = default_tokenizer(ccfg.text.vocab_size)

    pseudo = {}
    if args.pseudo_captions and os.path.exists(args.pseudo_captions):
        with open(args.pseudo_captions) as fh:
            pseudo = json.load(fh)

    # build (crop, caption, object_id) triples from the store
    ds = EpisodeDetectionDataset(args.exp_path, label_modality="bbs")
    crops, caps, obj_ids = [], [], []
    size = ccfg.vision.image_size
    for i in range(len(ds)):
        s = ds[i]
        raw = ds.loader.get_sample(s.episode, ds._find_cam(s.episode, "bbs"),
                                   "bbs", s.step).data
        caption_list = raw.get("captions")
        h, w = s.image.shape[:2]
        for j in np.nonzero(s.valid)[0]:
            key = f"{s.episode}_{int(s.object_ids[j])}"
            cap = pseudo.get(key)
            if cap is None and caption_list is not None and j < len(
                    caption_list):
                cap = str(caption_list[j])
            if not cap:
                continue
            box = expand_boxes(jnp.asarray([s.boxes[j]], jnp.float32), 0.2,
                               h, w)
            crop = crop_and_resize(jnp.asarray(s.image, jnp.float32), box,
                                   size)[0]
            crops.append(np.asarray(crop, np.uint8))
            caps.append(cap)
            obj_ids.append(int(s.object_ids[j]))
    if not crops:
        print(json.dumps({"error": "no training triples found"}))
        return
    print(f"[finetune] {len(crops)} caption-crop pairs", flush=True)

    params = init_captioner(jax.random.PRNGKey(0), ccfg)
    state = create_train_state(params, lr=args.lr)
    tokens = tok.encode_batch(caps, ccfg.text.context_length)
    images = np.stack(crops)
    ids = np.asarray(obj_ids, np.int32)
    n = len(crops)
    losses = []
    for ep in range(args.epochs):
        order = np.random.default_rng(ep).permutation(n)
        for i in range(0, n - args.batch + 1, args.batch):
            sel = order[i:i + args.batch]
            state, aux = train_step(
                state, jnp.asarray(images[sel]), jnp.asarray(tokens[sel]),
                jnp.asarray(ids[sel]),
                jnp.ones((len(sel),), bool), ccfg, lr=args.lr,
                triplet_weight=args.triplet_weight)
            losses.append(float(aux["loss"]))
    with open(args.save, "wb") as fh:
        pickle.dump(jax.tree_util.tree_map(np.asarray, state.params), fh)
    print(json.dumps({"pairs": n, "steps": len(losses),
                      "first_loss": losses[0] if losses else None,
                      "last_loss": losses[-1] if losses else None,
                      "saved": args.save}))


if __name__ == "__main__":
    main()
