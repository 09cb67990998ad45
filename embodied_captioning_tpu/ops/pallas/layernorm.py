"""Pallas LayerNorm kernel (TPU).

Why: on-chip profiling of the ViT-L encode showed each block's LayerNorm
fusion costing ~1.5 ms — XLA fuses the residual-stream materialization into
the reduction fusion, and lane-axis (minor-dim) reductions run at ~93 GB/s
on this chip (measured, scripts/probe_bw-style), dragging the whole fused
traffic to reduce speed. A dedicated kernel reads each row block into VMEM
once, computes two-pass mean / (x-mean)^2 statistics there (the second pass
re-reads VMEM, not HBM, so it is free), and writes the normalized bf16
output — HBM traffic is exactly read+write at streaming speed.

Gated by D (the normalized axis) being lane-aligned; everything else falls
back to the jnp implementation in models/common.layernorm.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

DEFAULT_BLOCK_N = 256


def _ln_kernel(x_ref, g_ref, b_ref, o_ref, *, eps: float):
    xf = x_ref[:].astype(jnp.float32)           # [block_n, D]
    # two-pass mean/var (x stays in VMEM, so the second pass is free);
    # E[x^2]-E[x]^2 cancels catastrophically for |mean| >> std rows
    m1 = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(xf - m1), axis=1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    y = (xf - m1) * inv * g_ref[:].astype(jnp.float32) + b_ref[:].astype(
        jnp.float32)
    o_ref[:] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "block_n", "interpret",
                                             "out_dtype"))
def layernorm_2d(x: jnp.ndarray, g: jnp.ndarray, b: jnp.ndarray,
                 eps: float = 1e-5, block_n: int = DEFAULT_BLOCK_N,
                 interpret: bool = False, out_dtype=None) -> jnp.ndarray:
    """x [N, D] (normalize over D), g/b [D] -> [N, D] in out_dtype (defaults
    to x.dtype). N need not divide block_n (rows are independent; the ragged
    final block is handled by pallas block padding)."""
    n, d = x.shape
    out_dtype = out_dtype or x.dtype
    grid = (pl.cdiv(n, block_n),)
    return pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_n, d), lambda i: (i, 0)),
            pl.BlockSpec((d,), lambda i: (0,)),
            pl.BlockSpec((d,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((block_n, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, d), out_dtype),
        interpret=interpret,
    )(x, g, b)


@functools.partial(jax.jit, static_argnames=("eps", "block_t", "interpret",
                                             "out_dtype"))
def layernorm_3d(x: jnp.ndarray, g: jnp.ndarray, b: jnp.ndarray,
                 eps: float = 1e-5, block_t: int = DEFAULT_BLOCK_N,
                 interpret: bool = False, out_dtype=None) -> jnp.ndarray:
    """x [B, T, D] (normalize over D) without flattening: reshaping
    [B, 257, D] to 2D is a PHYSICAL copy on TPU (row-count padding differs),
    which ate the kernel's whole win when this path reshaped."""
    bsz, t, d = x.shape
    out_dtype = out_dtype or x.dtype

    def kernel3(x_ref, g_ref, b_ref, o_ref):
        xf = x_ref[:].astype(jnp.float32)       # [1, block_t, D]
        m1 = jnp.mean(xf, axis=2, keepdims=True)
        var = jnp.mean(jnp.square(xf - m1), axis=2, keepdims=True)
        inv = jax.lax.rsqrt(var + eps)
        y = (xf - m1) * inv * g_ref[:].astype(jnp.float32) + b_ref[:].astype(
            jnp.float32)
        o_ref[:] = y.astype(o_ref.dtype)

    grid = (bsz, pl.cdiv(t, block_t))
    return pl.pallas_call(
        kernel3,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_t, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((d,), lambda i, j: (0,)),
            pl.BlockSpec((d,), lambda i, j: (0,)),
        ],
        out_specs=pl.BlockSpec((1, block_t, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, t, d), out_dtype),
        interpret=interpret,
    )(x, g, b)


def layernorm_nd(x: jnp.ndarray, g: jnp.ndarray, b: jnp.ndarray,
                 eps: float = 1e-5, interpret: bool = False,
                 out_dtype=None) -> jnp.ndarray:
    """Normalize over the last axis of an arbitrary-rank x."""
    if x.ndim == 3:
        return layernorm_3d(x, g, b, eps=eps, interpret=interpret,
                            out_dtype=out_dtype)
    shp = x.shape
    y = layernorm_2d(x.reshape(-1, shp[-1]), g, b, eps=eps,
                     interpret=interpret, out_dtype=out_dtype)
    return y.reshape(shp)
