"""Pallas attention kernels (TPU).

Fused QK^T -> softmax -> PV for the encoder hot path (ViT layers are where
the perception program's FLOPs live). Avoids materializing the [B, H, T, T]
score matrix in HBM — profiled on the ViT-L encode, the XLA einsum path
spends ~1.5 ms/layer writing+rereading the f32[64,16,257,257] scores.

Two kernels:
  - single-block (T_pad <= MAX_SINGLE_BLOCK_T): the whole (b, h) attention
    lives in VMEM; plain (not online) softmax; one grid step per (b, h).
  - blocked flash: standard running-max/denominator recurrence for long T.

Both keep the MATMUL INPUTS IN BF16 (f32 accumulation via
preferred_element_type) — an earlier revision cast q/k/v to f32 first,
which runs the MXU at the f32 rate and doubled VMEM traffic; it measured
slower than XLA at every size. Softmax statistics stay f32.

Used by models/common.mha when `use_flash()` is on (env ECAP_USE_PALLAS=1)
and shapes qualify (self-attention, no KV cache, T multiple of the block).
Parity-tested against the jnp reference in tests/test_pallas.py (interpret
mode on CPU).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128
MAX_SINGLE_BLOCK_T = 512
NEG_INF = -1e30


def _attn_single_block_kernel(q_ref, k_ref, v_ref, o_ref, *, causal: bool,
                              sm_scale: float, valid_len: int):
    # q_ref/k_ref/v_ref/o_ref: [bh_blk, T, d]; everything in VMEM. Multiple
    # (b, h) pairs per grid step so each DMA moves MBs, not ~100 KB — with
    # one pair per step the kernel measured DMA-latency-bound (~5 GB/s).
    bh, t, d = q_ref.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    for i in range(bh):  # static unroll over the block's (b, h) pairs
        q = q_ref[i]
        k = k_ref[i]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale  # [T, T] f32
        if valid_len < t:
            s = jnp.where(cols < valid_len, s, NEG_INF)
        if causal:
            s = jnp.where(rows >= cols, s, NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        p = (p / jnp.maximum(l, 1e-30)).astype(v_ref.dtype)
        o_ref[i] = jnp.dot(p, v_ref[i],
                           preferred_element_type=jnp.float32
                           ).astype(o_ref.dtype)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, causal: bool,
                  sm_scale: float, valid_len: int):
    # q_ref: [block_q, d]; k_ref/v_ref: [T, d]; o_ref: [block_q, d]
    block_q, d = q_ref.shape
    t = k_ref.shape[0]
    q_idx = pl.program_id(1)

    q = q_ref[:]  # stays bf16: matmuls accumulate in f32 via
    # preferred_element_type; only softmax state is f32

    def body(ki, carry):
        acc, m_prev, l_prev = carry
        k_blk = k_ref[pl.ds(ki * block_k, block_k), :]
        v_blk = v_ref[pl.ds(ki * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        if valid_len < t:
            # padded keys beyond valid_len are masked out
            s = jnp.where(ki * block_k + cols < valid_len, s, NEG_INF)
        if causal:
            rows = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            mask = (q_idx * block_q + rows) >= (ki * block_k + cols)
            s = jnp.where(mask, s, NEG_INF)
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1))
        alpha = jnp.exp(m_prev - m_cur)
        p = jnp.exp(s - m_cur[:, None])
        l_cur = l_prev * alpha + jnp.sum(p, axis=1)
        acc = acc * alpha[:, None] + jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return (acc, m_cur, l_cur)

    n_k = t // block_k
    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q,), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q,), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, n_k, body, (acc0, m0, l0))
    o_ref[:] = (acc / jnp.maximum(l, 1e-30)[:, None]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("causal", "block_q", "block_k",
                                             "interpret", "valid_len"))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    causal: bool = False, block_q: int = DEFAULT_BLOCK_Q,
                    block_k: int = DEFAULT_BLOCK_K,
                    interpret: bool = False,
                    valid_len: Optional[int] = None) -> jnp.ndarray:
    """q, k, v: [B, H, T, D] -> [B, H, T, D].

    T <= MAX_SINGLE_BLOCK_T takes the single-block kernel, which accepts
    ANY T directly (no padding or divisibility requirement). Longer T uses
    the blocked flash recurrence: there T must divide by the blocks, and
    callers with odd lengths zero-pad to the block multiple and pass the
    true length as static `valid_len` (padded keys are masked; padded
    query rows produce garbage the caller slices off)."""
    b, h, t, d = q.shape
    sm_scale = 1.0 / math.sqrt(d)
    qf = q.reshape(b * h, t, d)
    kf = k.reshape(b * h, t, d)
    vf = v.reshape(b * h, t, d)
    vl = valid_len if valid_len else t

    if t <= MAX_SINGLE_BLOCK_T:
        bh = b * h
        bh_blk = 1
        for cand in (16, 8, 4, 2):
            # VMEM budget: 4 io blocks (q/k/v/o at the input itemsize —
            # callers may pass f32, doubling the footprint) + per-pair
            # [T,T] f32 score+probability intermediates across the static
            # unroll (conservatively assume Mosaic does not reuse them)
            io_bytes = cand * 4 * t * d * q.dtype.itemsize
            scratch_bytes = cand * 2 * t * t * 4
            if bh % cand == 0 and io_bytes + scratch_bytes <= 10 * 1024 * 1024:
                bh_blk = cand
                break
        kernel = functools.partial(_attn_single_block_kernel, causal=causal,
                                   sm_scale=sm_scale, valid_len=vl)
        out = pl.pallas_call(
            kernel,
            grid=(bh // bh_blk,),
            in_specs=[
                pl.BlockSpec((bh_blk, t, d), lambda i: (i, 0, 0)),
                pl.BlockSpec((bh_blk, t, d), lambda i: (i, 0, 0)),
                pl.BlockSpec((bh_blk, t, d), lambda i: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((bh_blk, t, d), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((bh, t, d), q.dtype),
            interpret=interpret,
        )(qf, kf, vf)
        return out.reshape(b, h, t, d)

    block_q = min(block_q, t)
    block_k = min(block_k, t)
    assert t % block_q == 0 and t % block_k == 0, (t, block_q, block_k)
    kernel = functools.partial(_flash_kernel, block_k=block_k, causal=causal,
                               sm_scale=sm_scale, valid_len=vl)
    out = pl.pallas_call(
        kernel,
        grid=(b * h, t // block_q),
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((None, t, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((None, t, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, t, d), q.dtype),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, h, t, d)


def attention_reference(q, k, v, causal: bool = False) -> jnp.ndarray:
    """jnp reference for parity tests."""
    d = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) / math.sqrt(d)
    if causal:
        t = q.shape[2]
        mask = jnp.tril(jnp.ones((t, t), bool))
        s = jnp.where(mask[None, None], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p,
                      v.astype(jnp.float32)).astype(q.dtype)
