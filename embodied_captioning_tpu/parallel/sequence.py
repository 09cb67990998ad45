"""Sequence parallelism: ring attention over a `seq` mesh axis.

Completes the framework's parallelism suite (data / tensor / pipeline /
sequence): activations are sharded on the TOKEN axis, so per-device
activation memory scales 1/n with sequence length — the regime where the
ViT encode's [B, T, W] residual stream (not the weights) is what overflows
HBM, e.g. very large crop batches or high-resolution patch grids.

Everything token-pointwise (patch embed, LayerNorm, QKV/out projections,
MLP) needs no communication at all — the tokens axis is simply sharded and
XLA keeps it sharded. Only the attention score/PV contraction mixes tokens;
it runs as RING ATTENTION (shard_map island): each device holds one K/V
block, computes a partial flash-style online softmax against its resident
block, then rotates the block to its ring neighbor with `lax.ppermute` —
n-1 hops ride the ICI ring while the MXU works on the current block, and
no device ever materializes the full [T, T] score matrix or the full K/V.

The reference has no analog (single-GPU torch, ref:
experimenting_env/captioner/models/coca/coca_model.py); this is the
scaling-book recipe for long sequences on TPU meshes.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.common import (
    Params, _proj_headmajor, dense, layernorm, mlp,
)
from ..models.quantize import maybe_dequant


def _ring_attention_local(q, k, v, key_valid, *, axis: str, n: int):
    """Per-shard ring attention body (runs under shard_map).

    q/k/v: [B, H, Tl, Dh] local token blocks; key_valid: [B, Tl] bool.
    Online-softmax (flash) accumulation in f32; each scan step attends to
    the resident K/V block, then ppermutes it one hop around the ring.
    """
    scale = 1.0 / math.sqrt(q.shape[-1])
    qf = q.astype(jnp.float32) * scale
    b, h, tq, _ = q.shape
    m0 = jnp.full((b, h, tq), -1e30, jnp.float32)
    l0 = jnp.zeros((b, h, tq), jnp.float32)
    o0 = jnp.zeros(q.shape[:3] + (v.shape[-1],), jnp.float32)
    # scan carries must carry the same varying-manual-axes type as the
    # body outputs (which derive from the device-varying q shard)
    if hasattr(jax.lax, "pcast"):
        m0, l0, o0 = (jax.lax.pcast(x, (axis,), to="varying")
                      for x in (m0, l0, o0))
    else:  # older spelling
        m0, l0, o0 = (jax.lax.pvary(x, (axis,)) for x in (m0, l0, o0))
    perm = [(j, (j + 1) % n) for j in range(n)]

    def process(k_blk, v_blk, val_blk, m, l, o):
        s = jnp.einsum("bhqd,bhkd->bhqk", qf, k_blk.astype(jnp.float32))
        s = jnp.where(val_blk[:, None, None, :], s, -1e30)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        # masked keys contribute exactly 0 even when a whole block is
        # padding (there exp(s - m_new) would be exp(0) = 1 otherwise)
        p = (jnp.exp(s - m_new[..., None])
             * val_blk[:, None, None, :].astype(jnp.float32))
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1)
        o = o * corr[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", p, v_blk.astype(jnp.float32))
        return m_new, l, o

    # resident block first, then rotate-and-process n-1 times — exactly
    # n-1 ICI hops (a rotate-after-process scan would pay a wasted final
    # rotation XLA cannot eliminate from the uniform loop body)
    m0, l0, o0 = process(k, v, key_valid, m0, l0, o0)

    def step(carry, _):
        k_blk, v_blk, val_blk, m, l, o = carry
        k_blk = jax.lax.ppermute(k_blk, axis, perm)
        v_blk = jax.lax.ppermute(v_blk, axis, perm)
        val_blk = jax.lax.ppermute(val_blk, axis, perm)
        m, l, o = process(k_blk, v_blk, val_blk, m, l, o)
        return (k_blk, v_blk, val_blk, m, l, o), None

    carry, _ = jax.lax.scan(step, (k, v, key_valid, m0, l0, o0), None,
                            length=n - 1)
    _, _, _, _, l, o = carry
    out = o / jnp.maximum(l, 1e-30)[..., None]
    return out.astype(q.dtype)


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   mesh: Mesh, axis: str = "seq",
                   key_valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Bidirectional attention with Q/K/V sharded on the token axis.

    Args:
      q, k, v: [B, H, T, Dh] (token axis sharded over `axis`; T must divide
        by the mesh axis size — pad and mask via `key_valid`).
      key_valid: [B, T] bool, True = real key token. Padding queries produce
        garbage rows; slice them off outside.

    Causal decoding is out of scope by design — the decode path uses KV
    caches (models/common.KVCache), where sequence sharding has nothing to
    win: the query is a single token.
    """
    n = int(mesh.shape[axis])
    if key_valid is None:
        key_valid = jnp.ones((k.shape[0], k.shape[2]), bool)
    spec = P(None, None, axis, None)
    fn = jax.shard_map(
        functools.partial(_ring_attention_local, axis=axis, n=n),
        mesh=mesh, in_specs=(spec, spec, spec, P(None, axis)),
        out_specs=spec)
    return fn(q, k, v, key_valid)


def _sp_block(p: Params, x: jnp.ndarray, heads: int, mesh: Mesh, axis: str,
              valid: jnp.ndarray, compute_dtype) -> jnp.ndarray:
    """Pre-LN transformer block with ring attention (mirrors
    models/common.block for the self-attention-only encoder case). The QKV
    projections reuse the dense path's head-major spelling — they are
    token-pointwise, so the seq sharding propagates with zero comms."""
    h = layernorm(p["ln1"], x)
    q = _proj_headmajor(p["attn"]["q"], h, heads, compute_dtype)
    k = _proj_headmajor(p["attn"]["k"], h, heads, compute_dtype)
    v = _proj_headmajor(p["attn"]["v"], h, heads, compute_dtype)
    out = ring_attention(q, k, v, mesh, axis, key_valid=valid)
    dh = out.shape[-1]
    d_model = p["attn"]["o"]["w"].shape[-1]
    wo = maybe_dequant(p["attn"]["o"]["w"], compute_dtype).reshape(
        heads, dh, d_model)
    y = jnp.einsum("bhqm,hmd->bqd", out.astype(compute_dtype), wo,
                   preferred_element_type=jnp.float32)
    x = x + (y + p["attn"]["o"]["b"]).astype(compute_dtype)
    return x + mlp(p["mlp"], layernorm(p["ln2"], x), compute_dtype)


def vit_features_seqparallel(params: Params, patch_tokens: jnp.ndarray,
                             cfg, mesh: Mesh, axis: str = "seq",
                             compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Sequence-parallel `models/vit.vit_features`: same math (parity-tested
    in tests/test_seq_parallel.py), tokens sharded over `axis`.

    The T+1 tokens (cls + patches) are padded up to a multiple of the mesh
    axis; pad tokens are masked out of every attention and sliced off at
    the end. Returns [B, T+1, width] like the dense path.
    """
    n = int(mesh.shape[axis])
    x = dense(params["patch"], patch_tokens, compute_dtype)
    b, t, _ = x.shape
    cls = jnp.broadcast_to(params["cls"], (b, 1, cfg.width))
    x = (jnp.concatenate([cls, x], axis=1)
         + params["pos"][None]).astype(compute_dtype)
    t1 = t + 1
    t_pad = -(-t1 // n) * n
    x = jnp.pad(x, ((0, 0), (0, t_pad - t1), (0, 0)))
    valid = (jnp.arange(t_pad) < t1)[None].repeat(b, axis=0)
    x = jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(None, axis, None)))
    x = layernorm(params["ln_pre"], x)
    for blk in params["blocks"]:
        x = _sp_block(blk, x, cfg.heads, mesh, axis, valid, compute_dtype)
    x = layernorm(params["ln_post"], x)
    return x[:, :t1]
