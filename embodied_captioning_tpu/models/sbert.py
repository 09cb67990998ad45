"""MiniLM-class sentence embedder (SBERT all-MiniLM-L6-v2 replacement).

The reference embeds every caption with
``SentenceTransformer("all-MiniLM-L6-v2")`` (384-d, mean pooling + L2 norm;
ref: agents/goal_exploration/goal_exploration.py:57, scripts/
compute_cosine_sim.py) — those embeddings drive the disagreement reward.
Here: a 6-layer bidirectional transformer encoder in JAX sharing the
framework tokenizer, mean-pooled over non-pad tokens and L2-normalized,
batched so a whole frame's captions embed in one MXU pass.
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SentenceEncoderConfig
from .common import (
    Params, block, block_init, block_post_ln, dense, dense_init,
    embedding_init, layernorm, layernorm_init,
)
from .tokenizer import PAD_ID, Tokenizer, default_tokenizer


def init_sentence_encoder(key, cfg: SentenceEncoderConfig) -> Params:
    ks = jax.random.split(key, cfg.layers + 3)
    p = {
        "tok_emb": embedding_init(ks[0], cfg.vocab_size, cfg.width),
        "pos_emb": jax.random.normal(ks[1], (cfg.max_len, cfg.width)) * 0.02,
        "blocks": [block_init(ks[2 + i], cfg.width, cfg.heads, cfg.mlp_ratio)
                   for i in range(cfg.layers)],
        "ln": layernorm_init(cfg.width),
        "proj": dense_init(ks[-1], cfg.width, cfg.embed_dim),
    }
    if cfg.post_ln:
        # BERT applies LayerNorm to the embedding sum before the first block
        p["emb_ln"] = layernorm_init(cfg.width)
    return p


@functools.partial(jax.jit, static_argnames=("cfg",))
def encode_tokens(params: Params, tokens: jnp.ndarray,
                  cfg: SentenceEncoderConfig) -> jnp.ndarray:
    """[B, T] int32 -> [B, embed_dim] L2-normalized sentence embeddings.

    With cfg.post_ln=True this computes the exact BERT/MiniLM encoder +
    SBERT mean-pooling function (emb LN -> post-LN blocks -> masked mean ->
    L2 norm), so converted all-MiniLM-L6-v2 weights reproduce reference
    embeddings (ref: SentenceTransformer("all-MiniLM-L6-v2"), used at
    agents/goal_exploration/goal_exploration.py:57).
    """
    cdt = jnp.float32 if cfg.dtype == "float32" else jnp.bfloat16
    t = tokens.shape[1]
    pad_mask = tokens != PAD_ID  # [B, T]
    x = params["tok_emb"][tokens] + params["pos_emb"][None, :t]
    attn_mask = pad_mask[:, None, None, :]  # bidirectional, mask pads
    if cfg.post_ln:
        from .common import BERT_LN_EPS

        x = layernorm(params["emb_ln"], x, eps=BERT_LN_EPS)
        for blk in params["blocks"]:
            x = block_post_ln(blk, x, cfg.heads, mask=attn_mask,
                              compute_dtype=cdt)
        x = x.astype(jnp.float32)
    else:
        for blk in params["blocks"]:
            x, _ = block(blk, x, cfg.heads, mask=attn_mask, compute_dtype=cdt)
        x = layernorm(params["ln"], x, out_dtype=jnp.float32)
    w = pad_mask.astype(jnp.float32)[..., None]
    pooled = jnp.sum(x * w, axis=1) / jnp.maximum(jnp.sum(w, axis=1), 1.0)
    e = dense(params["proj"], pooled, compute_dtype=cdt).astype(jnp.float32)
    return e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-8)


class SentenceEncoder:
    """Host-friendly wrapper: strings in, embeddings out (SentenceTransformer
    .encode() surface)."""

    def __init__(self, params: Params, cfg: SentenceEncoderConfig,
                 tokenizer: Tokenizer | None = None):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer or default_tokenizer(cfg.vocab_size)

    @staticmethod
    def create(seed: int = 0,
               cfg: SentenceEncoderConfig | None = None) -> "SentenceEncoder":
        cfg = cfg or SentenceEncoderConfig()
        params = init_sentence_encoder(jax.random.PRNGKey(seed), cfg)
        return SentenceEncoder(params, cfg)

    def encode(self, sentences: Sequence[str]) -> np.ndarray:
        n = len(sentences)
        if n == 0:
            return np.zeros((0, self.cfg.embed_dim), np.float32)
        tokens = self.tokenizer.encode_batch(list(sentences),
                                             self.cfg.max_len)
        # bucket the batch dim to powers of two so varying group sizes hit
        # one compiled program instead of recompiling per shape
        bucket = 1 << (n - 1).bit_length()
        if bucket > n:
            tokens = np.concatenate(
                [tokens, np.zeros((bucket - n, tokens.shape[1]),
                                  tokens.dtype)])
        out = np.asarray(encode_tokens(self.params, jnp.asarray(tokens),
                                       self.cfg))
        return out[:n]
