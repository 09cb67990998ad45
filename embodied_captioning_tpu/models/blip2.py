"""BLIP-2-class captioner: ViT + Q-Former bridge + causal LM decoder,
with ITM/ITC scoring heads.

Second captioner family for parity with the reference's BLIP-2 path
(ref: experimenting_env/captioner/models/blip2/blip2.py:16-29 wraps HF
`Salesforce/blip2-opt-2.7b`; the Q-former ITM/ITC matching scores back the
pseudo-captioner's `blip2_itm`/`blip2_itc` methods,
ref: captioner/pseudocaptioner.py:193-308).

Architecture (from scratch, framework blocks):
  frozen-style ViT encoder (models/vit.py)
  Q-Former: N learned queries; per layer self-attention over
    [queries ; text] + cross-attention of queries into image tokens
  language head: causal transformer over [projected queries ; caption]
  ITC: query-pool embedding vs text embedding (contrastive)
  ITM: binary match head over query-text joint features

Same KV-cached batched generation contract as models/captioner.py.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import VitConfig
from .common import (
    KVCache, Params, block, block_init, causal_mask, dense, dense_init,
    embedding_init, layernorm, layernorm_init, mha, mha_init,
)
from .tokenizer import BOS_ID, EOS_ID, PAD_ID
from .vit import init_vit, vit_features
from ..ops.image import preprocess_for_vit


@dataclass(frozen=True)
class Blip2Config:
    vision: VitConfig = field(default_factory=VitConfig)
    num_queries: int = 32
    qformer_width: int = 768
    qformer_layers: int = 6
    qformer_heads: int = 12
    lm_width: int = 768
    lm_layers: int = 12
    lm_heads: int = 12
    vocab_size: int = 1024
    context_length: int = 77
    max_caption_len: int = 30
    embed_dim: int = 256  # ITC projection

    @staticmethod
    def tiny() -> "Blip2Config":
        return Blip2Config(
            vision=VitConfig(image_size=64, patch_size=8, width=64, layers=2,
                             heads=2, pool_queries=8, pool_heads=2,
                             embed_dim=64),
            num_queries=8, qformer_width=64, qformer_layers=2,
            qformer_heads=2, lm_width=64, lm_layers=2, lm_heads=2,
            context_length=32, max_caption_len=12, embed_dim=32)


def init_blip2(key, cfg: Blip2Config) -> Params:
    ks = iter(jax.random.split(key, 16 + cfg.qformer_layers + cfg.lm_layers))
    params: Params = {
        "vision": init_vit(next(ks), cfg.vision),
        "queries": jax.random.normal(next(ks), (cfg.num_queries,
                                                cfg.qformer_width)) * 0.02,
        "q_tok_emb": embedding_init(next(ks), cfg.vocab_size,
                                    cfg.qformer_width),
        "q_pos": jax.random.normal(
            next(ks), (cfg.context_length, cfg.qformer_width)) * 0.02,
        "q_blocks": [block_init(next(ks), cfg.qformer_width,
                                cfg.qformer_heads,
                                cross_dim=cfg.vision.width)
                     for _ in range(cfg.qformer_layers)],
        "q_ln": layernorm_init(cfg.qformer_width),
        "itc_img": dense_init(next(ks), cfg.qformer_width, cfg.embed_dim),
        "itc_txt": dense_init(next(ks), cfg.qformer_width, cfg.embed_dim),
        "itm_head": dense_init(next(ks), cfg.qformer_width, 2),
        "lm_proj": dense_init(next(ks), cfg.qformer_width, cfg.lm_width),
        "lm_tok_emb": embedding_init(next(ks), cfg.vocab_size, cfg.lm_width),
        "lm_pos": jax.random.normal(
            next(ks), (cfg.num_queries + cfg.context_length,
                       cfg.lm_width)) * 0.02,
        "lm_blocks": [block_init(next(ks), cfg.lm_width, cfg.lm_heads)
                      for _ in range(cfg.lm_layers)],
        "lm_ln": layernorm_init(cfg.lm_width),
        "lm_head": dense_init(next(ks), cfg.lm_width, cfg.vocab_size),
        "logit_scale": jnp.asarray(2.659, jnp.float32),
    }
    return params


# ---------------------------------------------------------------------------
# Q-Former
# ---------------------------------------------------------------------------


def qformer(params: Params, img_feats: Optional[jnp.ndarray],
            cfg: Blip2Config,
            text_tokens: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Queries (and optional text) attend jointly; queries cross-attend the
    image. `img_feats=None` is the UNIMODAL TEXT mode (BLIP-2's ITC text
    branch): text self-attends only — no queries, no image cross-attention,
    so the resulting embedding is image-independent. Returns
    [B, Q(+T), width] (or [B, T, width] in text mode)."""
    nq = cfg.num_queries
    if img_feats is None:
        if text_tokens is None:
            raise ValueError("text_tokens required in unimodal text mode")
        nq = 0
        t = text_tokens.shape[1]
        x = (params["q_tok_emb"][text_tokens]
             + params["q_pos"][None, :t]).astype(jnp.bfloat16)
        attn_mask = (text_tokens != PAD_ID)[:, None, None, :]
    else:
        b = img_feats.shape[0]
        x = jnp.broadcast_to(params["queries"][None], (b,) +
                             params["queries"].shape).astype(jnp.bfloat16)
        if text_tokens is not None:
            t = text_tokens.shape[1]
            txt = (params["q_tok_emb"][text_tokens]
                   + params["q_pos"][None, :t]).astype(jnp.bfloat16)
            x = jnp.concatenate([x, txt], axis=1)
            pad = text_tokens != PAD_ID
            attn_mask = jnp.concatenate(
                [jnp.ones((b, nq), bool), pad], axis=1)[:, None, None, :]
        else:
            attn_mask = None
    for blk in params["q_blocks"]:
        # self-attention over [queries ; text]
        h, _ = mha(blk["attn"], layernorm(blk["ln1"], x), cfg.qformer_heads,
                   mask=attn_mask)
        x = x + h
        if img_feats is not None:
            # only queries cross-attend into the image
            q_part = x[:, :nq]
            h, _ = mha(blk["xattn"], layernorm(blk["ln_x"], q_part),
                       cfg.qformer_heads, kv=img_feats)
            x = x.at[:, :nq].add(h)
        from .common import mlp

        x = x + mlp(blk["mlp"], layernorm(blk["ln2"], x))
    return layernorm(params["q_ln"], x)


def encode_image_queries(params: Params, images_u8: jnp.ndarray,
                         cfg: Blip2Config) -> jnp.ndarray:
    feats = vit_features(params["vision"], preprocess_for_vit(
        images_u8, cfg.vision.image_size, cfg.vision.patch_size), cfg.vision)
    return qformer(params, feats, cfg)  # [B, Q, width]


# ---------------------------------------------------------------------------
# ITC / ITM scoring (ref: pseudocaptioner blip2_itc / blip2_itm)
# ---------------------------------------------------------------------------


def itc_score(params: Params, images_u8: jnp.ndarray, tokens: jnp.ndarray,
              cfg: Blip2Config) -> jnp.ndarray:
    """Image-text contrastive score [B]: max over queries of cosine(query
    embedding, text embedding) — BLIP-2 ITC semantics. The text embedding
    comes from the Q-Former's UNIMODAL text mode: a joint image-text pass
    would let text attend queries that cross-attended the image, image-
    contaminating the "contrastive" text branch (and it would re-run the
    ViT encoder a second time)."""
    q = encode_image_queries(params, images_u8, cfg)
    qe = dense(params["itc_img"], q).astype(jnp.float32)
    qe = qe / jnp.maximum(jnp.linalg.norm(qe, axis=-1, keepdims=True), 1e-8)
    txt_feats = qformer(params, None, cfg, text_tokens=tokens)
    pad = (tokens != PAD_ID).astype(jnp.float32)[..., None]
    te = jnp.sum(txt_feats * pad, axis=1) / jnp.maximum(
        jnp.sum(pad, axis=1), 1.0)
    te = dense(params["itc_txt"], te).astype(jnp.float32)
    te = te / jnp.maximum(jnp.linalg.norm(te, axis=-1, keepdims=True), 1e-8)
    return jnp.max(jnp.einsum("bqd,bd->bq", qe, te), axis=1)


def itm_score(params: Params, images_u8: jnp.ndarray, tokens: jnp.ndarray,
              cfg: Blip2Config) -> jnp.ndarray:
    """Image-text matching probability [B] from the joint query features."""
    feats = vit_features(params["vision"], preprocess_for_vit(
        images_u8, cfg.vision.image_size, cfg.vision.patch_size), cfg.vision)
    joint = qformer(params, feats, cfg, text_tokens=tokens)
    pooled = jnp.mean(joint[:, : cfg.num_queries], axis=1)
    logits = dense(params["itm_head"], pooled)
    return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[:, 1]


# ---------------------------------------------------------------------------
# captioning LM
# ---------------------------------------------------------------------------


def _lm_prefix(params: Params, images_u8: jnp.ndarray, cfg: Blip2Config
               ) -> jnp.ndarray:
    q = encode_image_queries(params, images_u8, cfg)
    return dense(params["lm_proj"], q)  # [B, Q, lm_width]


@functools.partial(jax.jit, static_argnames=("cfg",))
def lm_logits(params: Params, images_u8: jnp.ndarray, tokens: jnp.ndarray,
              cfg: Blip2Config) -> jnp.ndarray:
    """Teacher-forced logits [B, T, V] with the query prefix attended
    causally-prefix style (prefix fully visible)."""
    prefix = _lm_prefix(params, images_u8, cfg)
    b, nq, _ = prefix.shape
    t = tokens.shape[1]
    emb = params["lm_tok_emb"][tokens]
    x = (jnp.concatenate([prefix, emb], axis=1)
         + params["lm_pos"][None, : nq + t]).astype(jnp.bfloat16)
    total = nq + t
    mask = jnp.tril(jnp.ones((total, total), bool))
    mask = mask.at[:, :nq].set(True)  # prefix visible everywhere
    mask = mask[None, None]
    for blk in params["lm_blocks"]:
        x, _ = block(blk, x, cfg.lm_heads, mask=mask)
    x = layernorm(params["lm_ln"], x)
    return dense(params["lm_head"], x[:, nq:])


@functools.partial(jax.jit, static_argnames=("cfg", "max_len"))
def generate(params: Params, images_u8: jnp.ndarray, key, cfg: Blip2Config,
             max_len: Optional[int] = None):
    """KV-cached greedy generation (same contract as captioner.generate)."""
    max_len = max_len or cfg.max_caption_len
    prefix = _lm_prefix(params, images_u8, cfg)
    b, nq, _ = prefix.shape
    head_dim = cfg.lm_width // cfg.lm_heads
    caches = tuple(KVCache.create(b, nq + max_len, cfg.lm_heads, head_dim)
                   for _ in range(cfg.lm_layers))

    # prime the caches with the prefix; cache_block_causal=False keeps full
    # prefix-to-prefix visibility (prefix-LM semantics, matching lm_logits)
    x = (prefix + params["lm_pos"][None, :nq]).astype(jnp.bfloat16)
    new_caches = []
    for blk, c in zip(params["lm_blocks"], caches):
        x, c = block(blk, x, cfg.lm_heads, cache=c,
                     cache_block_causal=False)
        new_caches.append(c)
    caches = tuple(new_caches)

    def step(carry, pos):
        tok, finished, caches = carry
        x = (params["lm_tok_emb"][tok][:, None]
             + params["lm_pos"][nq + pos][None, None]).astype(jnp.bfloat16)
        cs = []
        for blk, c in zip(params["lm_blocks"], caches):
            x, c = block(blk, x, cfg.lm_heads, cache=c)
            cs.append(c)
        x = layernorm(params["lm_ln"], x)
        logits = dense(params["lm_head"], x)[:, 0]
        nxt = jnp.argmax(logits.astype(jnp.float32), axis=-1).astype(
            jnp.int32)
        nxt = jnp.where(finished, PAD_ID, nxt)
        finished = finished | (nxt == EOS_ID)
        return (nxt, finished, tuple(cs)), (nxt, logits)

    tok0 = jnp.full((b,), BOS_ID, jnp.int32)
    fin0 = jnp.zeros((b,), bool)
    _, (toks, step_logits) = jax.lax.scan(step, (tok0, fin0, caches),
                                          jnp.arange(max_len - 1))
    tokens = jnp.concatenate([tok0[:, None], jnp.moveaxis(toks, 0, 1)],
                             axis=1)
    lengths = jnp.sum((tokens != PAD_ID).astype(jnp.int32), axis=1)
    return tokens, jnp.moveaxis(step_logits, 0, 1), lengths


def blip2_caption_loss(params: Params, images_u8: jnp.ndarray,
                       tokens: jnp.ndarray, cfg: Blip2Config):
    """LM cross-entropy fine-tuning loss."""
    logits = lm_logits(params, images_u8, tokens, cfg)
    targets = tokens[:, 1:]
    pred = logits[:, :-1]
    mask = (targets != PAD_ID).astype(jnp.float32)
    logp = jax.nn.log_softmax(pred.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)
