"""Turnkey real-checkpoint porting: torch checkpoint + tokenizer artifact
-> ready-to-run framework model (params + config + tokenizer), one call.

Builds on the exact converters in tools/convert_weights.py and the artifact
tokenizers in models/tokenizer_artifacts.py; model dimensions are INFERRED
from the state-dict shapes so no architecture flags are needed
(ref: the reference loads `coca_ViT-L-14` via open_clip and
`all-MiniLM-L6-v2` via sentence-transformers —
captioner/models/coca/coca.py:19-33, goal_exploration.py:57).
CLI: scripts/port_checkpoint.py.
"""

from __future__ import annotations

import dataclasses
import json
import os
import pickle
from typing import Any, Dict, Optional, Tuple

import numpy as np

from ..config import (
    CaptionerConfig, SentenceEncoderConfig, TextDecoderConfig, VitConfig,
)
from ..models.tokenizer_artifacts import CLIPBPETokenizer, WordPieceTokenizer
from .convert_weights import (
    convert_bert_encoder, convert_coca, load_torch_checkpoint,
)


def _count(state: Dict[str, Any], fmt: str) -> int:
    i = 0
    while fmt.format(i) in state:
        i += 1
    return i


def infer_coca_config(state: Dict[str, Any],
                      tokenizer: CLIPBPETokenizer,
                      max_caption_len: int = 30) -> CaptionerConfig:
    """CaptionerConfig from an open_clip CoCa state dict's shapes. Head
    counts follow open_clip's width/64 convention (ViT-L 1024/64=16,
    text 768/64=12)."""
    conv = state["visual.conv1.weight"]
    v_width, _, patch, _ = tuple(conv.shape)
    n_pos = state["visual.positional_embedding"].shape[0] - 1
    grid = int(round(n_pos ** 0.5))
    queries = state["visual.attn_pool.query"].shape[0]
    t_emb = state["text.token_embedding.weight"]
    vocab, t_width = tuple(t_emb.shape)
    ctx = state["text.positional_embedding"].shape[0]
    v_layers = _count(state, "visual.transformer.resblocks.{}.ln_1.weight")
    t_layers = _count(state, "text.transformer.resblocks.{}.ln_1.weight")
    mm_pairs = _count(state, "text_decoder.resblocks.{}.ln_1.weight")
    fc = state["visual.transformer.resblocks.0.mlp.c_fc.weight"]
    mlp_ratio = fc.shape[0] / v_width
    if vocab != tokenizer.vocab_size:
        raise ValueError(
            f"checkpoint vocab {vocab} != tokenizer vocab "
            f"{tokenizer.vocab_size} — wrong merges table?")
    return CaptionerConfig(
        vision=VitConfig(
            image_size=grid * patch, patch_size=patch, width=v_width,
            layers=v_layers, heads=max(1, v_width // 64),
            mlp_ratio=mlp_ratio, pool_queries=queries,
            pool_heads=max(1, t_width // 96), embed_dim=t_width),
        text=TextDecoderConfig(
            context_length=ctx, vocab_size=vocab, width=t_width,
            heads=max(1, t_width // 64), layers=t_layers,
            cross_layers=2 * mm_pairs, mlp_ratio=mlp_ratio,
            pad_id=tokenizer.pad_id, bos_id=tokenizer.bos_id,
            eos_id=tokenizer.eos_id),
        # decode cannot outrun the positional table
        max_caption_len=min(max_caption_len, ctx),
    )


def infer_sbert_config(state: Dict[str, Any],
                       tokenizer: WordPieceTokenizer
                       ) -> SentenceEncoderConfig:
    emb = state["embeddings.word_embeddings.weight"]
    vocab, width = tuple(emb.shape)
    layers = _count(state, "encoder.layer.{}.attention.self.query.weight")
    max_len = min(64, state["embeddings.position_embeddings.weight"].shape[0])
    fc = state["encoder.layer.0.intermediate.dense.weight"]
    if vocab != tokenizer.vocab_size:
        raise ValueError(
            f"checkpoint vocab {vocab} != vocab.txt {tokenizer.vocab_size}")
    return SentenceEncoderConfig(
        vocab_size=vocab, width=width, layers=layers,
        heads=max(1, width // 32), mlp_ratio=fc.shape[0] / width,
        max_len=max_len, embed_dim=width, post_ln=True, dtype="float32")


def _strip_bert_prefix(state: Dict[str, Any]) -> Dict[str, Any]:
    """Handle HF layouts: bare BertModel, `bert.`-prefixed, and
    sentence-transformers' `0.auto_model.` wrapping."""
    for prefix in ("", "bert.", "0.auto_model."):
        if any(k.startswith(prefix + "embeddings.word_embeddings")
               for k in state):
            return {k[len(prefix):]: v for k, v in state.items()
                    if k.startswith(prefix)}
    raise ValueError("no BERT embeddings found in checkpoint")


def port_coca(checkpoint: str, bpe_path: str, allow_pickle: bool = False,
              max_caption_len: int = 30
              ) -> Tuple[Dict[str, Any], CaptionerConfig, CLIPBPETokenizer]:
    state = load_torch_checkpoint(checkpoint, allow_pickle=allow_pickle)
    # size the merges table to the checkpoint's own vocab (49,408 for real
    # CLIP BPE; smaller for test fixtures)
    vocab = state["text.token_embedding.weight"].shape[0]
    tok = CLIPBPETokenizer.load(bpe_path, expected_vocab=int(vocab))
    cfg = infer_coca_config(state, tok, max_caption_len)
    params = convert_coca(state)
    return params, cfg, tok


def port_sbert(checkpoint: str, vocab_path: str, allow_pickle: bool = False
               ) -> Tuple[Dict[str, Any], SentenceEncoderConfig,
                          WordPieceTokenizer]:
    state = _strip_bert_prefix(
        load_torch_checkpoint(checkpoint, allow_pickle=allow_pickle))
    tok = WordPieceTokenizer.load(vocab_path)
    cfg = infer_sbert_config(state, tok)
    params = convert_bert_encoder(state)
    return params, cfg, tok


def save_ported(out_dir: str, params: Dict[str, Any], cfg,
                tokenizer_src: str, kind: str) -> None:
    """Persist a ported model: params pickle + config json + the tokenizer
    artifact copied alongside (self-contained directory)."""
    import shutil

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "params.pkl"), "wb") as fh:
        pickle.dump(jax_to_numpy(params), fh)
    with open(os.path.join(out_dir, "config.json"), "w") as fh:
        json.dump({"kind": kind, "config": dataclasses.asdict(cfg),
                   "tokenizer_file": os.path.basename(tokenizer_src)}, fh,
                  indent=2)
    dst = os.path.join(out_dir, os.path.basename(tokenizer_src))
    if os.path.abspath(tokenizer_src) != os.path.abspath(dst):
        shutil.copyfile(tokenizer_src, dst)


def jax_to_numpy(tree):
    import jax

    return jax.tree_util.tree_map(np.asarray, tree)


def load_ported(out_dir: str):
    """(params, config, tokenizer) from a save_ported directory."""
    with open(os.path.join(out_dir, "config.json")) as fh:
        meta = json.load(fh)
    with open(os.path.join(out_dir, "params.pkl"), "rb") as fh:
        params = pickle.load(fh)
    tok_path = os.path.join(out_dir, meta["tokenizer_file"])
    c = meta["config"]
    if meta["kind"] == "coca":
        cfg = CaptionerConfig(
            vision=VitConfig(**c["vision"]),
            text=TextDecoderConfig(**c["text"]),
            max_caption_len=c["max_caption_len"], dtype=c["dtype"])
        tok = CLIPBPETokenizer.load(tok_path,
                                    expected_vocab=cfg.text.vocab_size)
    else:
        cfg = SentenceEncoderConfig(**c)
        tok = WordPieceTokenizer.load(tok_path)
    return params, cfg, tok
