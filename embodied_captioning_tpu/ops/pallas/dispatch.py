"""Pallas kernel dispatch: opt-in fast paths with XLA fallbacks.

Kernels are enabled with ECAP_USE_PALLAS=1 (or force-disabled with =0).
Every kernel has an XLA-equivalent reference implementation; the dispatchers
fall back automatically when shapes don't qualify (block divisibility,
cached decoding, etc.), so correctness never depends on the kernel path.
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp


def pallas_enabled() -> bool:
    return os.environ.get("ECAP_USE_PALLAS", "0") == "1"


def block_kernels_enabled() -> bool:
    """The whole-block decode kernels (decode_self_block /
    decode_cross_block) need in-kernel lane-splitting reshapes
    ([B, D] -> [B, H, Dh]) that Mosaic rejects at serving dims
    ("infer-vector-layout: unsupported shape cast", measured on v5e —
    scripts/probe_kernelcompile.py). They stay separately gated until
    they are restructured grid-over-heads; the standalone attention/MLP
    kernels (pre-split inputs, no in-kernel reshape) compile and are what
    ECAP_USE_PALLAS=1 enables."""
    return (pallas_enabled()
            and os.environ.get("ECAP_PALLAS_BLOCKS", "0") == "1")


def _interpret() -> bool:
    """Kernels lower for TPU only; on CPU (tests, ECAP_PLATFORM=cpu) run
    the interpreter so the opt-in paths stay correct everywhere."""
    import jax

    return jax.default_backend() != "tpu"


def maybe_flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          causal: bool = False) -> Optional[jnp.ndarray]:
    """[B, H, T, D] attention via the Pallas kernels if enabled and the
    shape qualifies. T <= 512 runs the single-block kernel directly (any
    length, no padding); longer T zero-pads to the 128 block with static
    key masking. None -> caller uses the XLA einsum path."""
    if not pallas_enabled():
        return None
    b, h, t, d = q.shape
    if t < 64 or d % 8 != 0:
        return None
    from .flash_attention import MAX_SINGLE_BLOCK_T, flash_attention

    if t <= MAX_SINGLE_BLOCK_T:
        # single-block kernel takes any T directly — no padding FLOPs
        return flash_attention(q, k, v, causal=causal,
                               interpret=_interpret())
    block = 128
    t_pad = ((t + block - 1) // block) * block
    if t_pad == t:
        return flash_attention(q, k, v, causal=causal,
                               interpret=_interpret())
    pad = ((0, 0), (0, 0), (0, t_pad - t), (0, 0))
    out = flash_attention(jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad),
                          causal=causal, valid_len=t,
                          interpret=_interpret())
    return out[:, :, :t]


def maybe_fused_preprocess(img_u8: jnp.ndarray, out_size: int, patch: int
                           ) -> Optional[jnp.ndarray]:
    if not pallas_enabled():
        return None
    if out_size % patch != 0:
        return None
    from .preprocess import fused_preprocess

    return fused_preprocess(img_u8, out_size, patch)


def _block_rows(b: int, per_row_bytes: int, budget: int = 12 << 20) -> int:
    """Largest divisor of b whose K/V footprint fits the VMEM budget."""
    bb = b
    while bb > 1 and bb * per_row_bytes > budget:
        # largest proper divisor
        for cand in range(bb // 2, 0, -1):
            if b % cand == 0:
                bb = cand
                break
    return max(bb, 1)


def _f32_tile_bytes(*dims: int) -> int:
    """Scoped-VMEM bytes for one materialized f32 tile of `dims`: Mosaic
    pads the minor dim to 128 lanes and the second-minor to 8 sublanes.
    The first on-chip run of the decode kernels OOM'd scoped VMEM
    (27.3 MB vs 16 MB) because the old estimate used the STORED dtype and
    UNPADDED minor dim, while Mosaic materializes the kernel's
    .astype(f32) copy at padded tile shape — for the self-attention cache
    [H, Dh, T=30] that is 128/30 * 2x larger than estimated."""
    pad = list(dims)
    pad[-1] = -(-pad[-1] // 128) * 128
    if len(pad) > 1:
        pad[-2] = -(-pad[-2] // 8) * 8
    n = 4
    for d in pad:
        n *= d
    return n


def maybe_decode_self_attention(q: jnp.ndarray, kt: jnp.ndarray,
                                v: jnp.ndarray, pos) -> Optional[jnp.ndarray]:
    """Fused single-query cached self-attention if enabled and the shape
    qualifies. q [B,H,Dh]; kt [B,H,Dh,T]; v [B,T,H,Dh]; pos scalar.
    None -> caller uses the XLA op-per-stage path."""
    if not pallas_enabled():
        return None
    b, h, dh = q.shape
    t = kt.shape[-1]
    if dh % 8 != 0:
        return None
    from .decode_attention import decode_self_attention

    # f32 in-kernel materializations of the two cache layouts, at Mosaic
    # tile padding (the bf16 refs themselves are ~1/3 of this on top)
    per_row = _f32_tile_bytes(h, dh, t) + _f32_tile_bytes(t, h, dh)
    return decode_self_attention(q, kt, v, pos,
                                 block_b=_block_rows(b, per_row),
                                 interpret=_interpret())


def maybe_decode_cross_attention(q: jnp.ndarray, kt: jnp.ndarray,
                                 v: jnp.ndarray, kt_scale=None,
                                 v_scale=None) -> Optional[jnp.ndarray]:
    """Fused single-query cross-attention (head-major V required).
    q [B,H,Dh]; kt [B,H,Dh,K]; v [B,H,K,Dh]."""
    if not pallas_enabled():
        return None
    b, h, dh = q.shape
    k = kt.shape[-1]
    if dh % 8 != 0:
        return None
    from .decode_attention import decode_cross_attention

    per_row = _f32_tile_bytes(h, dh, k) + _f32_tile_bytes(h, k, dh)
    return decode_cross_attention(q, kt, v, kt_scale, v_scale,
                                  block_b=_block_rows(b, per_row),
                                  interpret=_interpret())


def maybe_decode_mlp(p_mlp, p_ln, x: jnp.ndarray) -> Optional[jnp.ndarray]:
    """Fused residual+LN+MLP for one decode token per row: x [B, 1, D] ->
    x + mlp(ln(x)). Handles int8 (QuantizedArray) or float weights.
    None -> caller uses the op-per-stage XLA path."""
    if not pallas_enabled():
        return None
    b, t, d = x.shape
    if t != 1:
        return None
    from ...models.quantize import QuantizedArray

    import jax.numpy as _jnp

    def split(w):
        if isinstance(w, QuantizedArray):
            return w.q, w.scale.astype(_jnp.float32)
        return w, _jnp.ones((w.shape[-1],), _jnp.float32)

    wfc, sfc = split(p_mlp["fc"]["w"])
    wpj, spj = split(p_mlp["proj"]["w"])
    f = wfc.shape[-1]
    # whole-problem VMEM residency: weights + activations must fit
    if (d * f + f * d) * wfc.dtype.itemsize > (10 << 20):
        return None
    from .decode_attention import decode_mlp

    out = decode_mlp(x[:, 0], p_ln["g"], p_ln["b"],
                     wfc, sfc, p_mlp["fc"]["b"],
                     wpj, spj, p_mlp["proj"]["b"],
                     interpret=_interpret())
    return out[:, None]


def maybe_decode_self_block(p_attn, p_ln, x: jnp.ndarray, cache, heads: int):
    """Entire single-token cached self-attention block fused (LN1 + QKV +
    cache write + attention + out-proj + residual). Returns
    (x_out [B,1,D], updated KVCache) or None for the XLA path."""
    if not block_kernels_enabled():
        return None
    b, t, d = x.shape
    if t != 1 or d % heads != 0 or (d // heads) % 8 != 0:
        return None
    from ...models.common import KVCache
    from ...models.quantize import QuantizedArray

    import jax.numpy as _jnp

    def split(w):
        if isinstance(w, QuantizedArray):
            return w.q, w.scale.astype(_jnp.float32)
        return w, _jnp.ones((w.shape[-1],), _jnp.float32)

    ws = {}
    for n in "qkvo":
        w = p_attn[n]["w"]
        shape = w.q.shape if isinstance(w, QuantizedArray) else w.shape
        if len(shape) != 2 or shape != (d, d):
            return None
        ws[n] = split(w)
    cache_bytes = (cache.k.size * cache.k.dtype.itemsize
                   + cache.v.size * cache.v.dtype.itemsize)
    w_bytes = sum(w.size * w.dtype.itemsize for w, _ in ws.values())
    if cache_bytes + w_bytes > (12 << 20):
        return None
    from .decode_attention import decode_self_block

    out, k_cur, v_cur = decode_self_block(
        x[:, 0], p_ln["g"], p_ln["b"],
        ws["q"][0], ws["q"][1], p_attn["q"]["b"],
        ws["k"][0], ws["k"][1], p_attn["k"]["b"],
        ws["v"][0], ws["v"][1], p_attn["v"]["b"],
        ws["o"][0], ws["o"][1], p_attn["o"]["b"],
        cache.k, cache.v, cache.index, heads=heads,
        interpret=_interpret())
    # the kernel does NO cache stores (Mosaic rejects the strided
    # [B,H,Dh,1] write); the caches are updated here with plain XLA
    # dynamic_update_slices, which alias in place inside the decode loop
    import jax as _jax

    dh = d // heads
    k_new = _jax.lax.dynamic_update_slice(
        cache.k, k_cur.reshape(b, heads, dh)[..., None],
        (0, 0, 0, cache.index))
    v_new = _jax.lax.dynamic_update_slice(
        cache.v, v_cur.reshape(b, 1, heads, dh), (0, cache.index, 0, 0))
    return out[:, None], KVCache(k_new, v_new, cache.index + 1)


def maybe_decode_cross_block(p_xattn, p_ln, x: jnp.ndarray, cross_kv,
                             heads: int) -> Optional[jnp.ndarray]:
    """Entire single-token cross-attention block fused (LN_x + q proj +
    attention over precomputed head-major K/V + out proj + residual).
    Returns x_out [B,1,D] or None for the XLA path."""
    if not block_kernels_enabled():
        return None
    b, t, d = x.shape
    if t != 1 or d % heads != 0 or (d // heads) % 8 != 0:
        return None
    from ...models.quantize import QuantizedArray, QuantizedKV

    import jax.numpy as _jnp

    if isinstance(cross_kv, QuantizedKV):
        kt, v = cross_kv.kt, cross_kv.v
        ks, vs = cross_kv.kt_scale, cross_kv.v_scale
    else:
        kt, v = cross_kv
        ks = vs = None
    # require the head-major V layout [B, H, K, Dh]
    if v.ndim != 4 or v.shape[1] != heads or v.shape[-1] != d // heads:
        return None
    if kt.ndim != 4 or kt.shape[1] != heads:
        return None

    def split(w):
        if isinstance(w, QuantizedArray):
            return w.q, w.scale.astype(_jnp.float32)
        return w, _jnp.ones((w.shape[-1],), _jnp.float32)

    wq = p_xattn["q"]["w"]
    wo = p_xattn["o"]["w"]
    for w in (wq, wo):
        shape = w.q.shape if isinstance(w, QuantizedArray) else w.shape
        if len(shape) != 2 or shape != (d, d):
            return None
    wq, sq = split(wq)
    wo, so = split(wo)
    # VMEM budget: the two weight blocks stay RESIDENT across grid steps,
    # so they count against the whole budget, not per grid step
    w_bytes = wq.size * wq.dtype.itemsize + wo.size * wo.dtype.itemsize
    if w_bytes > (6 << 20):
        return None
    from .decode_attention import decode_cross_block

    per_row = heads * (d // heads) * kt.shape[-1] * kt.dtype.itemsize * 2
    out = decode_cross_block(
        x[:, 0], p_ln["g"], p_ln["b"], wq, sq, p_xattn["q"]["b"],
        wo, so, p_xattn["o"]["b"], kt, v, ks, vs, heads=heads,
        block_b=_block_rows(b, per_row), interpret=_interpret())
    return out[:, None]
