"""Shared neural-net building blocks (functional JAX, explicit param pytrees).

Design: params are nested dicts of jnp arrays created by ``init_*`` functions;
forward passes are pure functions taking (params, inputs, ...). No framework
module state — everything composes under jit/vmap/scan/pjit, and KV caches are
explicit operands so autoregressive decoding is a `lax.scan` over a pure step.

Matmuls run in bfloat16 on the MXU with float32 accumulation
(`preferred_element_type`); params stay float32 (master copy).
"""

from __future__ import annotations

import functools
import math
import os as _os
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def dense_init(key, d_in: int, d_out: int, scale: Optional[float] = None
               ) -> Params:
    scale = scale if scale is not None else 1.0 / math.sqrt(d_in)
    return {
        "w": jax.random.normal(key, (d_in, d_out), jnp.float32) * scale,
        "b": jnp.zeros((d_out,), jnp.float32),
    }


def dense(p: Params, x: jnp.ndarray, compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Matmul in compute dtype with f32 accumulation; output stays in the
    compute dtype so the residual stream is bf16 (halves HBM traffic of the
    elementwise chain between matmuls).

    Serving: when the weight is int8 (QuantizedArray) and W8A8 is enabled,
    activations quantize per token and the dot runs int8 x int8 -> int32 on
    the MXU — 2x the bf16 matmul rate on v5e."""
    from .quantize import QuantizedArray, dense_w8a8, maybe_dequant, \
        w8a8_enabled

    w = p["w"]
    if isinstance(w, QuantizedArray) and w8a8_enabled():
        y = dense_w8a8(x, w)
    else:
        y = jnp.dot(x.astype(compute_dtype), maybe_dequant(w, compute_dtype),
                    preferred_element_type=jnp.float32)
    return (y + p["b"]).astype(compute_dtype)


def layernorm_init(dim: int) -> Params:
    return {"g": jnp.ones((dim,), jnp.float32),
            "b": jnp.zeros((dim,), jnp.float32)}


def _layernorm_ref(x: jnp.ndarray, g: jnp.ndarray, b: jnp.ndarray,
                   eps: float, out_dtype) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    m1 = jnp.mean(xf, axis=-1, keepdims=True)
    if x.dtype == jnp.bfloat16:
        # one-pass E[x^2]-E[x]^2 in f32: for bf16 inputs any cancellation
        # is below the input's own 8-bit mantissa, and the single fused
        # reduction saves ~700 small ops per decode batch (measured ~3 fps).
        # Relative floor: a near-constant row (mean^2/var > f32's 2^24) can
        # cancel to ~0 and rsqrt(eps) would amplify it ~sqrt(1/eps)x; the
        # true variance of a bf16-rounded constant row is >= ~(2^-9 m1)^2,
        # so clamping at m1^2 * 3e-7 only engages below representability
        var = jnp.maximum(
            jnp.mean(xf * xf, axis=-1, keepdims=True) - m1 * m1,
            m1 * m1 * 3e-7)
    else:
        # f32 inputs (e.g. the sbert post-LN path at BERT eps=1e-12) keep
        # the two-pass form: E[x^2]-E[x]^2 cancels catastrophically for
        # rows with |mean| >> std, which real BERT hidden states have
        var = jnp.mean(jnp.square(xf - m1), axis=-1, keepdims=True)
    y = (xf - m1) * jax.lax.rsqrt(var + eps) * g + b
    return y.astype(out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _ln_pallas(x, g, b, eps):
    from ..ops.pallas.layernorm import layernorm_nd

    return layernorm_nd(x, g, b, eps=eps)


def _ln_pallas_fwd(x, g, b, eps):
    return _ln_pallas(x, g, b, eps), (x, g, b)


def _ln_pallas_bwd(eps, res, dy):
    x, g, b = res
    xf = x.astype(jnp.float32)
    dyf = dy.astype(jnp.float32)
    m1 = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = (xf - m1) * inv
    dxhat = dyf * g.astype(jnp.float32)
    dx = inv * (dxhat - jnp.mean(dxhat, axis=-1, keepdims=True)
                - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True))
    red = tuple(range(x.ndim - 1))
    dg = jnp.sum(dyf * xhat, axis=red)
    db = jnp.sum(dyf, axis=red)
    return (dx.astype(x.dtype), dg.astype(g.dtype), db.astype(b.dtype))


_ln_pallas.defvjp(_ln_pallas_fwd, _ln_pallas_bwd)

# OPT-IN (ECAP_PALLAS_LN=1, read lazily): the 3D-native kernel is 3.3x
# faster than XLA's windowed fusions on an ISOLATED LN+residual chain
# (54 -> 33 ms for 48 LNs at [64,257,1024]) — but default-on it measured
# 83.2 vs 87.4 fps e2e: the opaque custom call breaks XLA's
# producer/consumer fusions around each LN, which cost more than the
# kernel saves. Useful where LN neighbors don't fuse; not in this encoder.
def _pallas_ln() -> bool:
    return _os.environ.get("ECAP_PALLAS_LN", "0") == "1"


def _ln_barrier() -> bool:
    """Opt-in (ECAP_LN_BARRIER=1, read lazily at trace time): wrap LN inputs
    in lax.optimization_barrier so XLA cannot fuse the LN-stats reduction
    into the producing matmul. At ViT-L encode shapes the fused form picks a
    crippled conv emitter (~1.6 ms/op vs 0.2 ms for the standalone reduce —
    see docs/BENCH.md); the barrier splits them. Probe:
    scripts/probe_lnfuse.py."""
    return _os.environ.get("ECAP_LN_BARRIER", "0") == "1"


def _ln_kernel_ok(x: jnp.ndarray) -> bool:
    """Kernel path: TPU backend, lane-aligned width, enough rows to win."""
    if not _pallas_ln() or x.ndim < 2:
        return False
    d = x.shape[-1]
    n = 1
    for s in x.shape[:-1]:
        n *= s
    if d % 128 != 0 or n < 1024:
        return False
    if x.dtype not in (jnp.bfloat16, jnp.float32):
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def layernorm(p: Params, x: jnp.ndarray, eps: float = 1e-5,
              out_dtype=None) -> jnp.ndarray:
    """Reductions in f32; output cast back to the input dtype by default so
    bf16 residual streams stay bf16.

    With ECAP_PALLAS_LN=1, large lane-aligned shapes on TPU take the
    Pallas kernel (ops/pallas/layernorm.py) via a custom VJP. The 3D-native
    kernel is 3.3x faster than XLA on an isolated LN chain but loses e2e
    here because it breaks XLA's surrounding fusions (see _PALLAS_LN note);
    kept opt-in."""
    out_dtype = out_dtype or x.dtype
    if _ln_barrier():
        x = jax.lax.optimization_barrier(x)
    if out_dtype == x.dtype and _ln_kernel_ok(x):
        return _ln_pallas(x, p["g"], p["b"], eps)
    return _layernorm_ref(x, p["g"], p["b"], eps, out_dtype)


def embedding_init(key, vocab: int, dim: int) -> jnp.ndarray:
    return jax.random.normal(key, (vocab, dim), jnp.float32) * 0.02


# ---------------------------------------------------------------------------
# Attention with optional KV cache
# ---------------------------------------------------------------------------


class KVCache(NamedTuple):
    """Per-layer KV cache: fixed-capacity ring written at `index`.

    k: [B, H, Dh, T_max] — head-major, time-minor, so the single-query
       q·K score contraction lowers to the MXU fusion path instead of a
       VPU multiply+reduce (same layout trick as `precompute_kv`; profiled
       ~3.5x per-op on the cross-attention decode).
    v: [B, T_max, H, Dh]; index: [] int32 (next write position).
    """

    k: jnp.ndarray
    v: jnp.ndarray
    index: jnp.ndarray

    @staticmethod
    def create(batch: int, t_max: int, heads: int, head_dim: int,
               dtype=jnp.bfloat16) -> "KVCache":
        return KVCache(
            k=jnp.zeros((batch, heads, head_dim, t_max), dtype),
            v=jnp.zeros((batch, t_max, heads, head_dim), dtype),
            index=jnp.zeros((), jnp.int32),
        )


def mha_init(key, dim: int, heads: int, kv_dim: Optional[int] = None) -> Params:
    kv_dim = kv_dim or dim
    del heads  # head count is threaded as a static argument to mha()
    ks = jax.random.split(key, 4)
    return {
        "q": dense_init(ks[0], dim, dim),
        "k": dense_init(ks[1], kv_dim, dim),
        "v": dense_init(ks[2], kv_dim, dim),
        "o": dense_init(ks[3], dim, dim, scale=1.0 / math.sqrt(dim)),
    }


def _split_heads(x: jnp.ndarray, heads: int) -> jnp.ndarray:
    b, t, d = x.shape
    return x.reshape(b, t, heads, d // heads)


# measured on the large-preset decode: fusion was a small net NEGATIVE
# (63.9 vs 64.7 fps at batch 16; 65.4 vs 66.3 at batch 32) — the per-step
# weight concat/dequant costs more than the saved dispatches — so opt-in.
# All ECAP_* toggles read the env lazily (like quantize.int8_kv_enabled) so
# tests can monkeypatch them uniformly.
def _fuse_qkv() -> bool:
    return _os.environ.get("ECAP_FUSE_QKV", "0") == "1"


def _fuse_qkv_enc() -> bool:
    """Encoder (uncached self-attention) QKV fusion is a separate knob:
    there the concat happens once per forward (not once per decode step),
    and the fused matmul reads the LN output once instead of three times."""
    return _os.environ.get("ECAP_FUSE_QKV_ENC", "0") == "1"


def precompute_kv(p: Params, kv_src: jnp.ndarray, heads: int,
                  compute_dtype=jnp.bfloat16):
    """Project K/V once for reuse across decode steps (cross-attention KV of
    a fixed encoder output is invariant during generation).

    K is returned TRANSPOSED to [B, H, Dh, K] (V stays [B, K, H, Dh]): with
    single-query decoding, the scores contraction q·K over the minor head
    dim otherwise lowers to a VPU multiply+reduce at ~197 GB/s (profiled:
    130 us/layer/step at ViT-L pooled K=256), while the symmetric w·V form
    runs as an MXU fusion at ~709 GB/s. Pre-transposing K makes q·K take
    the fast path too. K is projected DIRECTLY into the transposed layout
    via a head-split weight einsum (the round-3 trace showed the
    dense->transpose form emitting 24 standalone relayout copies,
    ~3.7 ms/batch; folding the transpose into the matmul deletes them)."""
    from .quantize import maybe_dequant, w8a8_enabled

    if w8a8_enabled():
        # W8A8 mode: keep the dense() spelling so the K projection runs as
        # an int8 matmul (dense_w8a8) like V; the relayout-copy saving below
        # only applies to the default bf16 serving path
        k = _split_heads(dense(p["k"], kv_src, compute_dtype), heads)
        kt = jnp.transpose(k, (0, 2, 3, 1))  # [B, H, Dh, K]
    else:
        dkv = kv_src.shape[-1]
        dh = p["k"]["w"].shape[-1] // heads  # w: [Dkv, H*Dh]
        wk = maybe_dequant(p["k"]["w"], compute_dtype).reshape(dkv, heads, dh)
        bk = p["k"]["b"].reshape(heads, dh)
        kt = (jnp.einsum("bkd,dhm->bhmk", kv_src.astype(compute_dtype), wk,
                         preferred_element_type=jnp.float32)
              + bk[None, :, :, None]).astype(compute_dtype)  # [B, H, Dh, K]
    v = _split_heads(dense(p["v"], kv_src, compute_dtype), heads)
    from .quantize import QuantizedArray, int8_kv_enabled, quantize_kv

    if isinstance(p["k"]["w"], QuantizedArray) and int8_kv_enabled():
        # int8 serving mode extends to the precomputed cross K/V: the
        # decode loop re-reads every layer's K/V each step, so this halves
        # the loop's dominant HBM traffic (the bitsandbytes-serving analog
        # for activations; ECAP_INT8_KV=0 reverts)
        q = quantize_kv(kt, v)
        if cross_v_headmajor():
            # [B, K, H, Dh] -> [B, H, K, Dh]; v_scale is per (B, H, Dh)
            # so it is unaffected by the transpose
            q = q._replace(v=jnp.transpose(q.v, (0, 2, 1, 3)))
        return q
    if cross_v_headmajor():
        v = jnp.transpose(v, (0, 2, 1, 3))
    return kt.astype(compute_dtype), v.astype(compute_dtype)


def cross_v_headmajor() -> bool:
    """Store the precomputed cross-attention V head-major [B, H, K, Dh]
    instead of [B, K, H, Dh] (lazy env knob, consumed consistently by
    precompute_kv and mha). The round-3 device trace shows the decode PV
    reading the [B, K, H, Dh] int8 V at 275 GB/s — strided per-head — vs
    620 GB/s for the pre-transposed K score op (scripts/probe_crossv.py).
    Default ON: the isolated layout probe measured parity, but the FULL
    headline program on v5e measured 74.15 -> 77.35 fps with head-major V
    (better fusion in context; docs/BENCH.md round-3 ladder). =0 reverts."""
    return _os.environ.get("ECAP_CROSS_V_HEADMAJOR", "1") == "1"


def _proj_headmajor(p_one: Params, x: jnp.ndarray, heads: int,
                    compute_dtype) -> jnp.ndarray:
    """[B, T, Din] @ head-split weight -> [B, H, T, Dh] directly (no
    post-matmul relayout: the round-3 trace showed the dense->reshape
    spelling emitting a 77 us copy per projection — 69 copies/encode)."""
    from .quantize import maybe_dequant

    d_in = x.shape[-1]
    dh = p_one["w"].shape[-1] // heads
    w = maybe_dequant(p_one["w"], compute_dtype).reshape(d_in, heads, dh)
    b = p_one["b"].reshape(heads, 1, dh)
    y = jnp.einsum("btd,dhm->bhtm", x.astype(compute_dtype), w,
                   preferred_element_type=jnp.float32)
    return (y + b).astype(compute_dtype)


def _mha_headmajor(p: Params, x: jnp.ndarray, heads: int,
                   kv: Optional[jnp.ndarray], mask, causal: bool,
                   compute_dtype) -> jnp.ndarray:
    """Uncached attention with head-major [B, H, T, Dh] projections
    end-to-end: scores/PV run as head-batched MXU matmuls without the
    [B, T, D] -> head-major relayout copies, and the out-projection
    contracts (h, m) jointly. Numerically identical to the reference
    spelling up to float reassociation (probe: scripts/probe_headmajor.py,
    rel ~7e-8; 121.5 -> 119.6 ms on the ViT-L encode x64)."""
    from .quantize import maybe_dequant

    q = _proj_headmajor(p["q"], x, heads, compute_dtype)
    src = x if kv is None else kv
    k = _proj_headmajor(p["k"], src, heads, compute_dtype)
    v = _proj_headmajor(p["v"], src, heads, compute_dtype)
    dh = q.shape[-1]
    logits = jnp.einsum("bhqm,bhkm->bhqk", q, k).astype(jnp.float32)
    logits = logits / math.sqrt(dh)
    if causal:
        # causal=True GUARANTEES causality; an explicit mask is combined,
        # not trusted to already imply it
        cm = causal_mask(q.shape[2])
        mask = cm if mask is None else (mask & cm)
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.float32(-1e30))
    m = jax.lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
    pexp = jnp.exp(logits - m).astype(compute_dtype)
    denom = jnp.sum(pexp.astype(jnp.float32), axis=-1)  # [B, H, Q]
    out = jnp.einsum("bhqk,bhkm->bhqm", pexp, v.astype(compute_dtype),
                     preferred_element_type=jnp.float32)
    out = (out / denom[..., None]).astype(compute_dtype)
    d_model = p["o"]["w"].shape[-1]
    wo = maybe_dequant(p["o"]["w"], compute_dtype).reshape(heads, dh, d_model)
    y = jnp.einsum("bhqm,hmd->bqd", out, wo,
                   preferred_element_type=jnp.float32)
    return (y + p["o"]["b"]).astype(compute_dtype)


def mha(p: Params, x: jnp.ndarray, heads: int,
        kv: Optional[jnp.ndarray] = None,
        mask: Optional[jnp.ndarray] = None,
        cache: Optional[KVCache] = None,
        compute_dtype=jnp.bfloat16,
        causal: bool = False,
        kv_precomputed=None,
        cache_block_causal: bool = True,
        ) -> Tuple[jnp.ndarray, Optional[KVCache]]:
    """Multi-head attention.

    Args:
      x:  [B, Tq, D] queries source.
      kv: [B, Tk, Dkv] keys/values source (defaults to x: self-attention).
      mask: broadcastable to [B, H, Tq, Tk'] additive-style boolean mask
        (True = attend). For cached decoding, Tk' is the cache capacity.
      cache: if given, new K/V are appended at cache.index and attention runs
        over the whole cache buffer (positions >= index+Tq are masked out).

    Returns (out [B, Tq, D], updated cache or None).
    """
    kv_scales = None  # (kt_scale, v_scale) when K/V arrive int8-quantized
    # default uncached bf16 path: head-major projections end-to-end (no
    # relayout copies). Skipped when the opt-in Pallas flash or W8A8 paths
    # are enabled (they consume the [B, T, H, Dh] spelling below), or with
    # ECAP_HEADMAJOR=0 (lazy, for A/B measurement).
    if (cache is None and kv_precomputed is None
            and compute_dtype == jnp.bfloat16
            and not _fuse_qkv_enc()
            and _os.environ.get("ECAP_HEADMAJOR", "1") == "1"):
        from ..ops.pallas.dispatch import pallas_enabled
        from .quantize import w8a8_enabled

        if not pallas_enabled() and not w8a8_enabled():
            return _mha_headmajor(p, x, heads, kv, mask, causal,
                                  compute_dtype), None
    # QKV-fusion (3 matmuls -> 1) on the cached decode path: measured a
    # small net negative on this chip (see _FUSE_QKV note), kept opt-in
    # via ECAP_FUSE_QKV=1 for hardware where dispatch dominates harder.
    if (cache is not None and kv is None and kv_precomputed is None
            and _fuse_qkv()):
        from .quantize import maybe_dequant

        w = jnp.concatenate(
            [maybe_dequant(p[n]["w"], compute_dtype) for n in "qkv"], axis=1)
        b3 = jnp.concatenate([p[n]["b"] for n in "qkv"])
        qkv = (jnp.dot(x.astype(compute_dtype), w,
                       preferred_element_type=jnp.float32)
               + b3).astype(compute_dtype)
        q, k, v = (_split_heads(t, heads)
                   for t in jnp.split(qkv, 3, axis=-1))
        kt = None
    elif kv_precomputed is not None:
        # precomputed head-major cross K/V (decode loop): shares the
        # kt-branch attention tail below, including bf16-stored softmax
        if cache is not None:
            raise ValueError(
                "kv_precomputed cannot be combined with a KV cache")
        q = _split_heads(dense(p["q"], x, compute_dtype), heads)
        from .quantize import QuantizedKV

        if isinstance(kv_precomputed, QuantizedKV):
            kt = kv_precomputed.kt  # int8; converts fuse into the einsums
            v = kv_precomputed.v
            kv_scales = (kv_precomputed.kt_scale, kv_precomputed.v_scale)
        else:
            kt, v = kv_precomputed  # kt: [B, H, Dh, Tk]; v: [B, Tk, H, Dh]
        k = None
        # fused single-query cross-attention kernel (opt-in; needs the
        # head-major V layout so the kernel reads V contiguously per head)
        if (x.shape[1] == 1 and mask is None and not causal
                and cross_v_headmajor()):
            from ..ops.pallas.dispatch import maybe_decode_cross_attention

            fused = maybe_decode_cross_attention(
                q[:, 0].astype(compute_dtype), kt, v,
                kv_scales[0] if kv_scales is not None else None,
                kv_scales[1] if kv_scales is not None else None)
            if fused is not None:
                out = fused.reshape(x.shape[0], 1, -1).astype(compute_dtype)
                return dense(p["o"], out, compute_dtype), None
    elif cache is None and kv is None and _fuse_qkv_enc():
        from .quantize import maybe_dequant

        w = jnp.concatenate(
            [maybe_dequant(p[n]["w"], compute_dtype) for n in "qkv"], axis=1)
        b3 = jnp.concatenate([p[n]["b"] for n in "qkv"])
        qkv = (jnp.dot(x.astype(compute_dtype), w,
                       preferred_element_type=jnp.float32)
               + b3).astype(compute_dtype)
        q, k, v = (_split_heads(t, heads)
                   for t in jnp.split(qkv, 3, axis=-1))
        kt = None
    else:
        q = _split_heads(dense(p["q"], x, compute_dtype), heads)
        kv_src = x if kv is None else kv
        k = _split_heads(dense(p["k"], kv_src, compute_dtype), heads)
        v = _split_heads(dense(p["v"], kv_src, compute_dtype), heads)
        kt = None

    _had_explicit_mask = mask is not None
    if cache is not None:
        tq = q.shape[1]
        old_index = cache.index
        k_new = jax.lax.dynamic_update_slice(
            cache.k, jnp.transpose(k, (0, 2, 3, 1)).astype(cache.k.dtype),
            (0, 0, 0, old_index))
        v_new = jax.lax.dynamic_update_slice(
            cache.v, v.astype(cache.v.dtype), (0, old_index, 0, 0))
        cache = KVCache(k_new, v_new, old_index + tq)
        kt, v = k_new, v_new
        t_max = kt.shape[3]
        pos = jnp.arange(t_max)[None, None, None, :]  # [1,1,1,Tk]
        if cache_block_causal:
            # causal WITHIN the newly written block too: query i (position
            # old_index + i) sees keys <= its own position — required for
            # multi-token teacher-forced verification passes
            q_pos = old_index + jnp.arange(tq)  # [Tq]
            cache_mask = pos <= q_pos[None, None, :, None]
        else:
            # full visibility over everything written (prefix-LM priming)
            cache_mask = pos < cache.index
        mask = cache_mask if mask is None else (mask & cache_mask)
        # fused single-token cached self-attention kernel (opt-in): the
        # kernel applies the `<= old_index` position mask itself,
        # equivalent to cache_block_causal at tq == 1
        if tq == 1 and not _had_explicit_mask and cache_block_causal:
            from ..ops.pallas.dispatch import maybe_decode_self_attention

            fused = maybe_decode_self_attention(
                q[:, 0].astype(compute_dtype), kt, v, old_index)
            if fused is not None:
                out = fused.reshape(q.shape[0], 1, -1).astype(compute_dtype)
                return dense(p["o"], out, compute_dtype), cache

    _pre_causal_mask_was_none = mask is None
    if causal and cache is None:
        # causal=True GUARANTEES causality on every path: synthesize the
        # tril mask and AND it with any explicit mask (identical when the
        # caller's mask is already tril, as all in-repo callers' are).
        # Cached decoding handles causality via cache_block_causal above.
        cm = causal_mask(q.shape[1])
        mask = cm if mask is None else (mask & cm)

    # opt-in Pallas flash path: uncached SELF-attention with NO explicit
    # mask (ViT shapes, or causal=True without a mask — the kernel applies
    # causality itself). An explicit mask disqualifies flash: the kernel
    # cannot apply it, and silently dropping it would break causal+padding
    # callers.
    if (cache is None and kv is None and kv_precomputed is None
            and (mask is None or (causal and _pre_causal_mask_was_none))):
        from ..ops.pallas.dispatch import maybe_flash_attention

        flash = maybe_flash_attention(
            jnp.moveaxis(q, 1, 2).astype(compute_dtype),
            jnp.moveaxis(k, 1, 2).astype(compute_dtype),
            jnp.moveaxis(v, 1, 2).astype(compute_dtype), causal=causal)
        if flash is not None:
            out = jnp.moveaxis(flash, 1, 2)
            b_, tq_, h_, d_ = out.shape
            return dense(p["o"], out.reshape(b_, tq_, h_ * d_),
                         compute_dtype), None

    dh = q.shape[-1]
    # scores stay in compute dtype (bf16): halves the HBM traffic of the
    # [B, H, T, T] tensor, which dominates encoder time; the softmax itself
    # runs in f32 for stability
    if kt is not None:
        logits = jnp.einsum("bqhd,bhdk->bhqk", q.astype(compute_dtype),
                            kt.astype(compute_dtype))
    else:
        logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(compute_dtype),
                            k.astype(compute_dtype))
    logits = logits.astype(jnp.float32) / math.sqrt(dh)
    if kv_scales is not None:
        logits = logits * kv_scales[0][:, :, None, :]
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.float32(-1e30))
    # softmax with the exp'd probabilities STORED in compute dtype and the
    # normalization folded in after the PV matmul: jax.nn.softmax would
    # materialize the [B, H, Tq, Tk] tensor in f32 (415 MB/layer at ViT-L
    # encode shapes — profiled ~1.5 ms/layer of pure HBM traffic); storing
    # bf16 probabilities halves that. max/denominator stay f32.
    m = jax.lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
    pexp = jnp.exp(logits - m).astype(compute_dtype)
    # denominator sums the SAME rounded probabilities the PV numerator uses
    # (f32 accumulation), so rows still sum to exactly 1 in bf16 mode
    denom = jnp.sum(pexp.astype(jnp.float32), axis=-1)  # f32 [B, H, Tq]
    if kv_precomputed is not None and cross_v_headmajor():
        # head-major V [B, H, K, Dh]: contiguous per-head reads in the
        # decode PV (see cross_v_headmajor)
        out = jnp.einsum("bhqk,bhkd->bhqd", pexp.astype(compute_dtype),
                         v.astype(compute_dtype),
                         preferred_element_type=jnp.float32)
        if kv_scales is not None:
            out = out * kv_scales[1][:, :, None, :]
        out = out / denom[..., None]
        out = jnp.transpose(out, (0, 2, 1, 3))
    else:
        out = jnp.einsum("bhqk,bkhd->bqhd", pexp.astype(compute_dtype),
                         v.astype(compute_dtype),
                         preferred_element_type=jnp.float32)
        if kv_scales is not None:
            out = out * kv_scales[1][:, None, :, :]
        out = out / jnp.moveaxis(denom, 1, 2)[..., None]
    b, tq2, h, d2 = out.shape
    out = out.reshape(b, tq2, h * d2).astype(compute_dtype)
    return dense(p["o"], out, compute_dtype), cache


def mlp_init(key, dim: int, hidden: int) -> Params:
    k1, k2 = jax.random.split(key)
    return {"fc": dense_init(k1, dim, hidden), "proj": dense_init(k2, hidden, dim)}


def mlp(p: Params, x: jnp.ndarray, compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    return dense(p["proj"], jax.nn.gelu(dense(p["fc"], x, compute_dtype)),
                 compute_dtype)



def _decode_fusion_ok(x, compute_dtype) -> bool:
    """Common gate for the fused decode-block kernels: bf16 stream only
    (the kernels implement the bf16 LN formulation and return bf16), and
    not under W8A8 (the kernels run bf16-activation matmuls, which would
    silently drop the int8-activation path W8A8 requests)."""
    if compute_dtype != jnp.bfloat16 or x.dtype != jnp.bfloat16:
        return False
    from .quantize import w8a8_enabled

    return not w8a8_enabled()


def block_init(key, dim: int, heads: int, mlp_ratio: float = 4.0,
               cross_dim: Optional[int] = None) -> Params:
    ks = jax.random.split(key, 3)
    p = {
        "ln1": layernorm_init(dim),
        "attn": mha_init(ks[0], dim, heads),
        "ln2": layernorm_init(dim),
        "mlp": mlp_init(ks[1], dim, int(dim * mlp_ratio)),
    }
    if cross_dim is not None:
        p["ln_x"] = layernorm_init(dim)
        p["xattn"] = mha_init(ks[2], dim, heads, kv_dim=cross_dim)
    return p


def block(p: Params, x: jnp.ndarray, heads: int,
          mask: Optional[jnp.ndarray] = None,
          cross: Optional[jnp.ndarray] = None,
          cache: Optional[KVCache] = None, compute_dtype=jnp.bfloat16,
          causal: bool = False, cross_kv=None,
          cache_block_causal: bool = True,
          ) -> Tuple[jnp.ndarray, Optional[KVCache]]:
    """Pre-LN transformer block with optional cross-attention sublayer.
    `causal=True` marks a pure causal mask, unlocking the flash kernel;
    `cross_kv` supplies precomputed cross-attention K/V (decode loop).

    Sublayers are keyed by param presence, so the same function runs both
    the native fused layout (attn + xattn + mlp in one block) and ported
    open_clip CoCa multimodal towers, whose layers interleave a self-attn
    block with a CROSS-ONLY block (no "attn" key; its KV input is
    pre-normalized by "ln_kv" = open_clip's ln_1_kv)."""
    if "attn" in p:
        fused = None
        if (cache is not None and x.shape[1] == 1 and mask is None
                and cache_block_causal
                and _decode_fusion_ok(x, compute_dtype)):
            # single-token cached decode: whole self-attention block (LN1 +
            # QKV + cache write + attention + out-proj + residual) as ONE
            # kernel (opt-in; the decode loop is per-op-overhead bound)
            from ..ops.pallas.dispatch import maybe_decode_self_block

            fused = maybe_decode_self_block(p["attn"], p["ln1"], x, cache,
                                            heads)
        if fused is not None:
            x, cache = fused
            x = x.astype(compute_dtype)
        else:
            h, cache = mha(p["attn"], layernorm(p["ln1"], x), heads,
                           mask=mask, cache=cache,
                           compute_dtype=compute_dtype, causal=causal,
                           cache_block_causal=cache_block_causal)
            x = x + h
    if (cross is not None or cross_kv is not None) and "xattn" in p:
        if cross is not None and "ln_kv" in p:
            cross = layernorm(p["ln_kv"], cross)
        fused_x = None
        if (cross is None and cross_kv is not None and x.shape[1] == 1
                and _decode_fusion_ok(x, compute_dtype)
                and cross_v_headmajor()):
            from ..ops.pallas.dispatch import maybe_decode_cross_block

            fused_x = maybe_decode_cross_block(p["xattn"], p["ln_x"], x,
                                               cross_kv, heads)
        if fused_x is not None:
            x = fused_x.astype(compute_dtype)
        else:
            h, _ = mha(p["xattn"], layernorm(p["ln_x"], x), heads, kv=cross,
                       compute_dtype=compute_dtype, kv_precomputed=cross_kv)
            x = x + h
    if "moe" in p:
        # mixture-of-experts MLP (opt-in via TextDecoderConfig.moe_experts;
        # top-2 routing capped by the expert count). Lazy import: moe.py
        # imports from this module.
        from ..parallel.moe import moe_mlp

        n_exp = p["moe"]["fc_w"].shape[0]
        h = moe_mlp(p["moe"], layernorm(p["ln2"], x),
                    top_k=min(2, n_exp), compute_dtype=compute_dtype)
        return x + h, cache
    # fused residual+LN+MLP for single-token cached decoding (opt-in)
    if (cache is not None and x.shape[1] == 1
            and _decode_fusion_ok(x, compute_dtype)):
        from ..ops.pallas.dispatch import maybe_decode_mlp

        fused = maybe_decode_mlp(p["mlp"], p["ln2"], x)
        if fused is not None:
            return fused.astype(x.dtype), cache
    x = x + mlp(p["mlp"], layernorm(p["ln2"], x), compute_dtype)
    return x, cache


BERT_LN_EPS = 1e-12  # HF BertConfig.layer_norm_eps


def block_post_ln(p: Params, x: jnp.ndarray, heads: int,
                  mask: Optional[jnp.ndarray] = None,
                  compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Post-LN transformer block (BERT/MiniLM layer ordering):
    ``x = LN1(x + attn(x)); x = LN2(x + mlp(x))`` with *exact* (erf) GELU
    and BERT's LayerNorm eps.

    Same param pytree layout as `block_init` (ln1/attn/ln2/mlp), so torch
    BERT weights convert positionally AND reproduce the reference function
    exactly (pre-LN blocks cannot: tools/convert_weights.convert_bert_encoder).
    """
    h, _ = mha(p["attn"], x, heads, mask=mask, compute_dtype=compute_dtype)
    x = layernorm(p["ln1"], x + h, eps=BERT_LN_EPS)
    h = dense(p["mlp"]["proj"],
              jax.nn.gelu(dense(p["mlp"]["fc"], x, compute_dtype),
                          approximate=False),
              compute_dtype)
    return layernorm(p["ln2"], x + h, eps=BERT_LN_EPS)


def causal_mask(t: int) -> jnp.ndarray:
    """[1, 1, T, T] lower-triangular attend mask."""
    return jnp.tril(jnp.ones((t, t), bool))[None, None]


def sinusoidal_positions(t: int, dim: int) -> jnp.ndarray:
    pos = jnp.arange(t)[:, None].astype(jnp.float32)
    i = jnp.arange(dim // 2)[None, :].astype(jnp.float32)
    angle = pos / jnp.power(10000.0, 2 * i / dim)
    return jnp.concatenate([jnp.sin(angle), jnp.cos(angle)], axis=-1)
