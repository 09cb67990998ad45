#!/usr/bin/env python
"""Port a real pretrained checkpoint into the framework — one command.

  # CoCa (open_clip torch checkpoint + CLIP BPE merges table):
  python scripts/port_checkpoint.py coca \
      --checkpoint open_clip_pytorch_model.bin \
      --tokenizer bpe_simple_vocab_16e6.txt.gz \
      --out /tmp/ported_coca [--image photo.npy] [--allow-pickle]

  # SBERT / MiniLM (HF pytorch_model.bin + vocab.txt):
  python scripts/port_checkpoint.py sbert \
      --checkpoint pytorch_model.bin --tokenizer vocab.txt \
      --out /tmp/ported_sbert [--sentence "a red couch"] [--hf-dir DIR]

Produces a self-contained directory (params.pkl + config.json + tokenizer
artifact; reload with tools.port.load_ported) and runs a smoke inference.
With --hf-dir (sbert) or importable open_clip (coca) a torch-side parity
check runs too — in this zero-egress environment those artifacts are
absent, so the harness activates only when they exist
(ref: the reference's model loading — captioner/models/coca/coca.py:19-33,
goal_exploration.py:57; checkpoint strip — evaluate_finetuned_model.py:
139-148).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("kind", choices=["coca", "sbert"])
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--tokenizer", required=True,
                    help="bpe_simple_vocab_16e6.txt.gz (coca) / vocab.txt "
                         "(sbert)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--allow-pickle", action="store_true",
                    help="permit non-weights_only torch.load (trusted files "
                         "only: unpickling executes code)")
    ap.add_argument("--image", default=None,
                    help="npy [H,W,3] uint8 to caption (coca smoke)")
    ap.add_argument("--sentence", default="a red couch in the living room",
                    help="sentence to embed (sbert smoke)")
    ap.add_argument("--max-caption-len", type=int, default=30)
    ap.add_argument("--hf-dir", default=None,
                    help="HF model dir for the sbert torch parity check")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from embodied_captioning_tpu.tools import port as P

    out = {"kind": args.kind, "out_dir": args.out}
    if args.kind == "coca":
        params, cfg, tok = P.port_coca(
            args.checkpoint, args.tokenizer,
            allow_pickle=args.allow_pickle,
            max_caption_len=args.max_caption_len)
        P.save_ported(args.out, params, cfg, args.tokenizer, "coca")
        out["config"] = {
            "vision_width": cfg.vision.width, "vision_layers": cfg.vision.layers,
            "image_size": cfg.vision.image_size, "vocab": cfg.text.vocab_size,
            "text_layers": cfg.text.layers,
            "mm_blocks": cfg.text.cross_layers,
            "bos": cfg.text.bos_id, "eos": cfg.text.eos_id}
        # smoke: caption an image (zeros if none supplied)
        from embodied_captioning_tpu.models import captioner as CAP

        if args.image:
            img = np.load(args.image)
        else:
            img = np.zeros((cfg.vision.image_size, cfg.vision.image_size, 3),
                           np.uint8)
        jparams = jax.tree_util.tree_map(jnp.asarray, params)
        toks, _, lengths = CAP.generate(
            jparams, jnp.asarray(img)[None], jax.random.PRNGKey(0), cfg)
        out["smoke_caption"] = tok.decode(np.asarray(toks)[0])
        out["smoke_tokens"] = int(lengths[0])
        # torch-side parity EXECUTES here (no open_clip needed): a plain-
        # torch structural replica is rebuilt at the checkpoint's own
        # dimensions, loaded from the same state dict, and teacher-forced
        # against the ported JAX model (tools/torch_replica.py)
        from embodied_captioning_tpu.tools.convert_weights import (
            load_torch_checkpoint,
        )
        from embodied_captioning_tpu.tools.torch_replica import (
            coca_parity_report,
        )

        state = load_torch_checkpoint(args.checkpoint,
                                      allow_pickle=args.allow_pickle)
        # teacher-force the smoke image against the generated prefix plus
        # a fixed probe prefix (generation may stop at 1 token on blank
        # smoke images)
        probe = np.asarray(toks)[:, : max(2, int(lengths[0]))]
        out["parity"] = coca_parity_report(state, params, cfg, img[None],
                                           probe)
        assert out["parity"]["teacher_forced_corr"] > 0.999, out["parity"]
    else:
        params, cfg, tok = P.port_sbert(args.checkpoint, args.tokenizer,
                                        allow_pickle=args.allow_pickle)
        P.save_ported(args.out, params, cfg, args.tokenizer, "sbert")
        out["config"] = {"width": cfg.width, "layers": cfg.layers,
                         "vocab": cfg.vocab_size, "post_ln": cfg.post_ln}
        from embodied_captioning_tpu.models import sbert as SB

        ids = tok.encode_batch([args.sentence], cfg.max_len)
        jparams = jax.tree_util.tree_map(jnp.asarray, params)
        emb = np.asarray(SB.encode_tokens(jparams, jnp.asarray(ids), cfg))
        out["smoke_embedding_norm"] = float(np.linalg.norm(emb[0]))
        out["smoke_embedding_head"] = [round(float(x), 5)
                                       for x in emb[0, :4]]
        if args.hf_dir:  # torch parity (transformers is baked in)
            import torch
            from transformers import AutoModel, AutoTokenizer

            hf_tok = AutoTokenizer.from_pretrained(args.hf_dir)
            hf = AutoModel.from_pretrained(args.hf_dir).eval()
            batch = hf_tok([args.sentence], return_tensors="pt",
                           padding=True, truncation=True,
                           max_length=cfg.max_len)
            with torch.no_grad():
                h = hf(**batch).last_hidden_state
            m = batch["attention_mask"][..., None].float()
            ref = ((h * m).sum(1) / m.sum(1)).numpy()
            ref = ref / np.linalg.norm(ref, axis=-1, keepdims=True)
            cos = float((emb[0] * ref[0]).sum())
            out["parity_cosine_vs_torch"] = round(cos, 6)
            assert cos > 0.999, f"parity failed: cosine {cos}"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
