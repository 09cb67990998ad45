"""Vision Transformer encoder with CoCa-style attentional pooler.

From-scratch JAX ViT (the reference vendors open_clip's torch CoCa ViT-L/14,
ref: captioner/models/coca/coca_model.py + model_configs/coca_ViT-L-14.json;
dims preserved in config.VitConfig presets). The patch embedding consumes
pre-patchified tokens (ops/image.patchify) so preprocessing fuses into the
first MXU matmul; all blocks run in bfloat16 with f32 accumulation.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import VitConfig
from ..ops.image import preprocess_for_vit
from .common import (
    Params, block, block_init, dense, dense_init, layernorm, layernorm_init,
    mha, mha_init,
)


def init_vit(key, cfg: VitConfig) -> Params:
    grid = cfg.image_size // cfg.patch_size
    tokens = grid * grid
    patch_dim = cfg.patch_size * cfg.patch_size * 3
    ks = jax.random.split(key, cfg.layers + 5)
    params: Params = {
        "patch": dense_init(ks[0], patch_dim, cfg.width),
        "pos": jax.random.normal(ks[1], (tokens + 1, cfg.width)) * 0.02,
        "cls": jax.random.normal(ks[2], (cfg.width,)) * 0.02,
        "ln_pre": layernorm_init(cfg.width),
        "ln_post": layernorm_init(cfg.width),
        "blocks": [block_init(ks[3 + i], cfg.width, cfg.heads, cfg.mlp_ratio)
                   for i in range(cfg.layers)],
        # attentional pooler: learned queries cross-attend to ViT tokens
        # (CoCa attentional_pool, ref: coca_model.py vision tower)
        "pool_q": jax.random.normal(ks[-2], (cfg.pool_queries, cfg.width))
        * 0.02,
        "pool_attn": mha_init(ks[-1], cfg.width, cfg.pool_heads),
        "pool_ln": layernorm_init(cfg.width),
        "proj": dense_init(jax.random.fold_in(key, 999), cfg.width,
                           cfg.embed_dim),
    }
    return params


def vit_features(params: Params, patch_tokens: jnp.ndarray,
                 cfg: VitConfig, final_ln: bool = True,
                 remat: bool = False) -> jnp.ndarray:
    """Patch tokens [B, T, p*p*3] -> contextual features [B, T+1, width].

    `final_ln=False` skips ln_post — open_clip's CoCa vision tower applies
    ln_post AFTER attentional pooling, not before (encode_image switches
    ordering when ported CoCa pooler params are present).
    `remat=True` checkpoints each block: backward re-computes block
    internals from the block input, shrinking stored activations from
    O(layers x internals) to O(layers x residual) — the ViT-L fine-tune
    memory fix (CaptionerConfig.remat)."""
    x = dense(params["patch"], patch_tokens)
    b = x.shape[0]
    cls = jnp.broadcast_to(params["cls"], (b, 1, cfg.width))
    # cast the residual stream back to bf16: cls/pos are f32 params, and
    # without this the add silently promotes all 24 blocks' residuals and
    # layernorm outputs to f32 (profiled: the LN fusions alone then cost
    # ~1.56 ms each writing f32[64,257,1024] at ViT-L scale)
    x = (jnp.concatenate([cls, x], axis=1)
         + params["pos"][None]).astype(jnp.bfloat16)
    x = layernorm(params["ln_pre"], x)

    def blk_fn(blk, h):
        return block(blk, h, cfg.heads)[0]

    if remat:
        blk_fn = jax.checkpoint(blk_fn)
    for blk in params["blocks"]:
        x = blk_fn(blk, x)
    return layernorm(params["ln_post"], x) if final_ln else x


def attentional_pool(params: Params, feats: jnp.ndarray,
                     pool_heads: int) -> jnp.ndarray:
    """Learned-query cross-attention pooling -> [B, pool_queries, width].
    Query 0 doubles as the global embedding (CoCa uses the first pooled token
    for the contrastive head and the rest for captioning).

    Two orderings:
    - native (default): attention then LayerNorm (`pool_ln`).
    - CoCa-exact: when `pool_ln_q`/`pool_ln_k` are present (produced by
      tools/convert_weights.convert_attn_pool), LayerNorms apply to the
      queries and context BEFORE attention with no output LN — bit-matching
      open_clip's AttentionalPooler so pretrained CoCa poolers port exactly.
    """
    b = feats.shape[0]
    if "pool_ln_q" in params:
        q1 = layernorm(params["pool_ln_q"], params["pool_q"])
        q = jnp.broadcast_to(q1[None], (b,) + q1.shape)
        kv = layernorm(params["pool_ln_k"], feats)
        out, _ = mha(params["pool_attn"], q, pool_heads, kv=kv)
        return out
    q = jnp.broadcast_to(params["pool_q"][None], (b,) + params["pool_q"].shape)
    out, _ = mha(params["pool_attn"], q, pool_heads, kv=feats)
    return layernorm(params["pool_ln"], out)


def encode_image(params: Params, images_u8: jnp.ndarray, cfg: VitConfig,
                 remat: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """uint8 [B, H, W, 3] -> (pooled tokens [B, Q(-1), width],
    global embedding [B, embed_dim] L2-normalized).

    Native ordering: transformer -> ln_post -> pool; all Q pooled tokens
    feed the decoder and query 0 doubles as the global embedding.
    Ported open_clip CoCa ordering (when CoCa-exact pooler params are
    present): transformer -> pool -> ln_post -> split — the global latent
    is pooled[:, 0] and the DECODER sees pooled[:, 1:]
    (open_clip VisionTransformer attn_pool branch + _global_pool 'first')."""
    tokens = preprocess_for_vit(images_u8, cfg.image_size, cfg.patch_size)
    coca_exact = "pool_ln_q" in params
    feats = vit_features(params, tokens, cfg, final_ln=not coca_exact,
                         remat=remat)
    pooled = attentional_pool(params, feats, cfg.pool_heads)
    if coca_exact:
        pooled = layernorm(params["ln_post"], pooled)
    g = dense(params["proj"], pooled[:, 0]).astype(jnp.float32)
    g = g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-8)
    if coca_exact:
        pooled = pooled[:, 1:]
    return pooled, g
