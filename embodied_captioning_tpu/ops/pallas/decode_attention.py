"""Fused single-query decode attention (TPU Pallas).

The round-3 device trace attributes the 29-step decode loop (56 ms of the
226 ms fused batch) mostly to per-op overhead on tiny tensors: each
layer-step issues 4-6 separate XLA ops per attention (scores multiply-
reduce, softmax max/exp/sum, PV multiply-reduce, normalize) of 0.2-13 MB
each, every one paying its own tile setup. These kernels fuse the whole
single-query attention into one op:

  decode_self_attention: q [B,H,Dh] x KV cache (kt [B,H,Dh,T] head-major,
      v [B,T,H,Dh] — the exact mha cache layouts, no relayout needed) with
      positions > pos masked out.
  decode_cross_attention: q [B,H,Dh] x precomputed cross K/V (kt
      [B,H,Dh,K], v HEAD-MAJOR [B,H,K,Dh] — requires
      ECAP_CROSS_V_HEADMAJOR), int8 or bf16, dequant fused.

Whole-problem VMEM residency: at the serving decode shapes the largest
case (cross, int8, B=64) moves ~25 MB of K/V per layer-step, gridded over
B so each step holds ~3 MB. All contractions are VPU multiply+reduce over
the sublane dim (single-query attention has no MXU-shaped matmul).

Opt-in via ECAP_USE_PALLAS=1 like the other kernels (dispatch.py);
parity-tested in interpret mode on CPU (tests/test_pallas.py).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _largest_divisor_at_most(n: int, cap: int) -> int:
    """Largest divisor of n that is <= cap (so a non-dividing block_b
    degrades to finer gridding, never to a whole-batch VMEM blowup)."""
    cap = max(1, min(cap, n))
    for d in range(cap, 0, -1):
        if n % d == 0:
            return d
    return 1


def _self_attn_kernel(pos_ref, q_ref, kt_ref, v_ref, o_ref):
    """One grid step = `bb` batch rows. q [bb,H,Dh] f32; kt [bb,H,Dh,T];
    v [bb,T,H,Dh]; out [bb,H,Dh] f32 (normalized)."""
    bb, h, dh = q_ref.shape
    t = kt_ref.shape[-1]
    pos = pos_ref[0]
    q = q_ref[:].astype(jnp.float32)          # [bb, H, Dh]
    kt = kt_ref[:].astype(jnp.float32)        # [bb, H, Dh, T]
    s = jnp.sum(q[..., None] * kt, axis=2)    # [bb, H, T] (reduce sublanes)
    s = s / (dh ** 0.5)
    live = jax.lax.broadcasted_iota(jnp.int32, (bb, h, t), 2) <= pos
    s = jnp.where(live, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)                        # [bb, H, T]
    denom = jnp.sum(p, axis=-1)               # [bb, H]
    v = v_ref[:].astype(jnp.float32)          # [bb, T, H, Dh]
    pt = jnp.transpose(p, (0, 2, 1))          # [bb, T, H]
    out = jnp.sum(pt[..., None] * v, axis=1)  # [bb, H, Dh]
    o_ref[:] = out / denom[..., None]


@functools.partial(jax.jit, static_argnames=("interpret", "block_b"))
def decode_self_attention(q: jnp.ndarray, kt: jnp.ndarray, v: jnp.ndarray,
                          pos: jnp.ndarray, block_b: int = 0,
                          interpret: bool = False) -> jnp.ndarray:
    """q [B,H,Dh] (any float dtype); kt [B,H,Dh,T]; v [B,T,H,Dh];
    pos scalar int32 (keys at positions > pos are masked).
    Returns normalized attention output [B,H,Dh] f32."""
    b, h, dh = q.shape
    t = kt.shape[-1]
    bb = _largest_divisor_at_most(b, block_b or b)
    grid = (b // bb,)
    pos_arr = jnp.full((1,), pos, jnp.int32)
    return pl.pallas_call(
        _self_attn_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bb, h, dh), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((bb, h, dh, t), lambda i, *_: (i, 0, 0, 0)),
                pl.BlockSpec((bb, t, h, dh), lambda i, *_: (i, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((bb, h, dh), lambda i, *_: (i, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, dh), jnp.float32),
        interpret=interpret,
    )(pos_arr, q, kt, v)


def _cross_attn_kernel(q_ref, kt_ref, v_ref, ks_ref, vs_ref, o_ref):
    """One grid step = `bb` batch rows. q [bb,H,Dh] f32; kt [bb,H,Dh,K]
    (int8 or float); v [bb,H,K,Dh] head-major; scales [bb,H,K]/[bb,H,Dh]
    (all-ones when K/V are float)."""
    bb, h, dh = q_ref.shape
    k = kt_ref.shape[-1]
    q = q_ref[:].astype(jnp.float32)
    kt = kt_ref[:].astype(jnp.float32)         # [bb, H, Dh, K]
    s = jnp.sum(q[..., None] * kt, axis=2)     # [bb, H, K]
    s = s / (dh ** 0.5) * ks_ref[:].astype(jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1)                # [bb, H]
    v = v_ref[:].astype(jnp.float32)           # [bb, H, K, Dh]
    out = jnp.sum(p[..., None] * v, axis=2)    # [bb, H, Dh]
    out = out * vs_ref[:].astype(jnp.float32)
    o_ref[:] = out / denom[..., None]


@functools.partial(jax.jit, static_argnames=("interpret", "block_b"))
def decode_cross_attention(q: jnp.ndarray, kt: jnp.ndarray, v: jnp.ndarray,
                           kt_scale: Optional[jnp.ndarray] = None,
                           v_scale: Optional[jnp.ndarray] = None,
                           block_b: int = 8,
                           interpret: bool = False) -> jnp.ndarray:
    """q [B,H,Dh]; kt [B,H,Dh,K] (int8/bf16); v [B,H,K,Dh] HEAD-MAJOR
    (int8/bf16); optional int8 scales kt_scale [B,H,K], v_scale [B,H,Dh].
    Returns normalized attention output [B,H,Dh] f32 (softmax scale
    applied to scores AFTER the 1/sqrt(dh), matching mha's int8-KV path).
    """
    b, h, dh = q.shape
    k = kt.shape[-1]
    if kt_scale is None:
        kt_scale = jnp.ones((b, h, k), jnp.float32)
    if v_scale is None:
        v_scale = jnp.ones((b, h, dh), jnp.float32)
    bb = _largest_divisor_at_most(b, block_b)
    grid = (b // bb,)
    return pl.pallas_call(
        _cross_attn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bb, h, dh), lambda i: (i, 0, 0)),
            pl.BlockSpec((bb, h, dh, k), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((bb, h, k, dh), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((bb, h, k), lambda i: (i, 0, 0)),
            pl.BlockSpec((bb, h, dh), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bb, h, dh), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, dh), jnp.float32),
        interpret=interpret,
    )(q, kt, v, kt_scale, v_scale)


def _mlp_kernel(x_ref, g_ref, b_ref, wfc_ref, sfc_ref, bfc_ref,
                wpj_ref, spj_ref, bpj_ref, o_ref, *, eps: float):
    """Fused residual + LN + fc + gelu(approx) + proj for ONE decode token
    per row: x [B, D] -> x + mlp(ln(x)). Weights int8-or-float with
    per-output-channel scales (ones when float). Matches models/common's
    bf16 layernorm formulation (one-pass variance + relative floor)."""
    x = x_ref[:]
    xf = x.astype(jnp.float32)
    m1 = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=1, keepdims=True) - m1 * m1,
                      m1 * m1 * 3e-7)
    xn = ((xf - m1) * jax.lax.rsqrt(var + eps)
          * g_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32))
    h = jax.lax.dot(xn.astype(jnp.bfloat16),
                    wfc_ref[:].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
    h = h * sfc_ref[:].astype(jnp.float32) + bfc_ref[:].astype(jnp.float32)
    h = jax.nn.gelu(h)  # approximate (matches models/common.mlp)
    y = jax.lax.dot(h.astype(jnp.bfloat16),
                    wpj_ref[:].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
    y = y * spj_ref[:].astype(jnp.float32) + bpj_ref[:].astype(jnp.float32)
    o_ref[:] = (xf + y).astype(x_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def decode_mlp(x: jnp.ndarray, g: jnp.ndarray, b: jnp.ndarray,
               wfc: jnp.ndarray, sfc: jnp.ndarray, bfc: jnp.ndarray,
               wpj: jnp.ndarray, spj: jnp.ndarray, bpj: jnp.ndarray,
               eps: float = 1e-5, interpret: bool = False) -> jnp.ndarray:
    """x [B, D] -> x + proj(gelu(fc(ln(x)))). wfc [D, F] / wpj [F, D]
    (int8 or float), sfc [F] / spj [D] per-channel scales."""
    bsz, d = x.shape
    return pl.pallas_call(
        functools.partial(_mlp_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((bsz, d), x.dtype),
        interpret=interpret,
    )(x, g, b, wfc, sfc, bfc, wpj, spj, bpj)


def _self_block_kernel(x_ref, g_ref, b_ref,
                       wq_ref, sq_ref, bq_ref, wk_ref, sk_ref, bk_ref,
                       wv_ref, sv_ref, bv_ref, wo_ref, so_ref, bo_ref,
                       kc_ref, vc_ref, pos_ref,
                       xo_ref, ko_ref, vo_ref, *, heads: int, eps: float):
    """Entire single-token cached self-attention block in one kernel:
    LN1 -> q/k/v projections -> masked attention over (cache < pos) plus
    the CURRENT token's k/v held in registers -> out projection ->
    residual. The kernel performs NO cache stores — Mosaic rejects the
    [B,H,Dh,1] strided store ("unsupported shape cast") — it instead
    emits k/v for the current position as [B, D] outputs and the caller
    (dispatch.maybe_decode_self_block) writes them into the caches with a
    plain XLA dynamic_update_slice. x [B, D]; weights [D, D]
    int8-or-float with per-channel scales."""
    bsz, d = x_ref.shape
    dh = d // heads
    pos = pos_ref[0]
    x = x_ref[:]
    xf = x.astype(jnp.float32)
    m1 = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=1, keepdims=True) - m1 * m1,
                      m1 * m1 * 3e-7)
    xn = ((xf - m1) * jax.lax.rsqrt(var + eps)
          * g_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
          ).astype(jnp.bfloat16)

    def proj(w_ref, s_ref, pb_ref):
        y = jax.lax.dot(xn, w_ref[:].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        return y * s_ref[:].astype(jnp.float32) + pb_ref[:].astype(
            jnp.float32)

    q = proj(wq_ref, sq_ref, bq_ref).reshape(bsz, heads, dh)
    k2 = proj(wk_ref, sk_ref, bk_ref)           # [B, D] f32
    v2 = proj(wv_ref, sv_ref, bv_ref)           # [B, D] f32
    ko_ref[:] = k2.astype(ko_ref.dtype)
    vo_ref[:] = v2.astype(vo_ref.dtype)
    # attention reads the caches at their STORED precision (bf16), exactly
    # like the XLA path, so the current token's k/v round-trip through the
    # cache dtype before use
    k3 = k2.astype(ko_ref.dtype).astype(jnp.float32).reshape(bsz, heads, dh)
    v3 = v2.astype(vo_ref.dtype).astype(jnp.float32).reshape(bsz, heads, dh)
    t = kc_ref.shape[-1]
    kt = kc_ref[:].astype(jnp.float32)          # [B, H, Dh, T]
    s = jnp.sum(q[..., None] * kt, axis=2) / (dh ** 0.5)
    live = jax.lax.broadcasted_iota(jnp.int32, (bsz, heads, t), 2) < pos
    s = jnp.where(live, s, NEG_INF)
    s_cur = jnp.sum(q * k3, axis=-1) / (dh ** 0.5)   # [B, H]
    m = jnp.maximum(jnp.max(s, axis=-1), s_cur)      # [B, H]
    p = jnp.exp(s - m[..., None])
    p_cur = jnp.exp(s_cur - m)
    denom = jnp.sum(p, axis=-1) + p_cur              # [B, H]
    vall = vc_ref[:].astype(jnp.float32)        # [B, T, H, Dh]
    pt = jnp.transpose(p, (0, 2, 1))            # [B, T, H]
    out = (jnp.sum(pt[..., None] * vall, axis=1)
           + p_cur[..., None] * v3) / denom[..., None]
    out2 = out.reshape(bsz, d).astype(jnp.bfloat16)
    y = jax.lax.dot(out2, wo_ref[:].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
    y = y * so_ref[:].astype(jnp.float32) + bo_ref[:].astype(jnp.float32)
    xo_ref[:] = (xf + y).astype(x_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "eps", "interpret"))
def decode_self_block(x, g, b, wq, sq, bq, wk, sk, bk, wv, sv, bv,
                      wo, so, bo, kc, vc, pos, heads: int,
                      eps: float = 1e-5, interpret: bool = False):
    """x [B, D] -> (x + selfattn(ln(x)) [B, D], k_cur [B, D], v_cur
    [B, D]). kc [B, H, Dh, T] / vc [B, T, H, Dh] are read-only; only
    positions < pos are attended, with the current token's k/v computed
    in-kernel. The caller writes k_cur/v_cur into the caches at `pos`
    (XLA dynamic_update_slice — see dispatch.maybe_decode_self_block)."""
    bsz, d = x.shape
    pos_arr = jnp.full((1,), pos, jnp.int32)
    return pl.pallas_call(
        functools.partial(_self_block_kernel, heads=heads, eps=eps),
        out_shape=(jax.ShapeDtypeStruct((bsz, d), x.dtype),
                   jax.ShapeDtypeStruct((bsz, d), kc.dtype),
                   jax.ShapeDtypeStruct((bsz, d), vc.dtype)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 17
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(x, g, b, wq, sq, bq, wk, sk, bk, wv, sv, bv, wo, so, bo, kc, vc,
      pos_arr)


def _cross_block_kernel(x_ref, g_ref, b_ref, wq_ref, sq_ref, bq_ref,
                        wo_ref, so_ref, bo_ref, kt_ref, v_ref,
                        ks_ref, vs_ref, o_ref, *, heads: int, eps: float):
    """Entire single-token cross-attention block for `bb` rows per grid
    step: LN_x -> q proj -> attention over precomputed K/V (int8-or-float,
    head-major V) -> out proj -> residual. The weight blocks' index maps
    are constant, so Mosaic keeps them VMEM-resident across grid steps."""
    bb, d = x_ref.shape
    dh = d // heads
    x = x_ref[:]
    xf = x.astype(jnp.float32)
    m1 = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=1, keepdims=True) - m1 * m1,
                      m1 * m1 * 3e-7)
    xn = ((xf - m1) * jax.lax.rsqrt(var + eps)
          * g_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
          ).astype(jnp.bfloat16)
    q = jax.lax.dot(xn, wq_ref[:].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
    q = (q * sq_ref[:].astype(jnp.float32)
         + bq_ref[:].astype(jnp.float32)).reshape(bb, heads, dh)
    kt = kt_ref[:].astype(jnp.float32)          # [bb, H, Dh, K]
    s = jnp.sum(q[..., None] * kt, axis=2)      # [bb, H, K]
    s = s / (dh ** 0.5) * ks_ref[:].astype(jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1)
    v = v_ref[:].astype(jnp.float32)            # [bb, H, K, Dh]
    out = jnp.sum(p[..., None] * v, axis=2)
    out = out * vs_ref[:].astype(jnp.float32) / denom[..., None]
    out2 = out.reshape(bb, d).astype(jnp.bfloat16)
    y = jax.lax.dot(out2, wo_ref[:].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
    y = y * so_ref[:].astype(jnp.float32) + bo_ref[:].astype(jnp.float32)
    o_ref[:] = (xf + y).astype(x_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "eps", "block_b",
                                             "interpret"))
def decode_cross_block(x, g, b, wq, sq, bq, wo, so, bo, kt, v,
                       kt_scale=None, v_scale=None, heads: int = 8,
                       eps: float = 1e-5, block_b: int = 8,
                       interpret: bool = False):
    """x [B, D] -> x + crossattn(ln(x)) over precomputed kt [B,H,Dh,K] and
    HEAD-MAJOR v [B,H,K,Dh] (int8 with scales, or float)."""
    bsz, d = x.shape
    h = heads
    dh = d // h
    k = kt.shape[-1]
    if kt_scale is None:
        kt_scale = jnp.ones((bsz, h, k), jnp.float32)
    if v_scale is None:
        v_scale = jnp.ones((bsz, h, dh), jnp.float32)
    bb = _largest_divisor_at_most(bsz, block_b)
    grid = (bsz // bb,)
    const = lambda i: (0, 0)  # noqa: E731  (weights: same block every step)
    return pl.pallas_call(
        functools.partial(_cross_block_kernel, heads=h, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bb, d), lambda i: (i, 0)),
            pl.BlockSpec((d,), lambda i: (0,)),
            pl.BlockSpec((d,), lambda i: (0,)),
            pl.BlockSpec((d, d), const),
            pl.BlockSpec((d,), lambda i: (0,)),
            pl.BlockSpec((d,), lambda i: (0,)),
            pl.BlockSpec((d, d), const),
            pl.BlockSpec((d,), lambda i: (0,)),
            pl.BlockSpec((d,), lambda i: (0,)),
            pl.BlockSpec((bb, h, dh, k), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((bb, h, k, dh), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((bb, h, k), lambda i: (i, 0, 0)),
            pl.BlockSpec((bb, h, dh), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bb, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, d), x.dtype),
        interpret=interpret,
    )(x, g, b, wq, sq, bq, wo, so, bo, kt, v, kt_scale, v_scale)
