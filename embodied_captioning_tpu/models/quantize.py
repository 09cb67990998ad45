"""Int8 weight quantization for serving (the bitsandbytes analog).

The reference serves BLIP-2 with `load_in_8bit=True` and Llama-3 in 4-bit
NF4 via bitsandbytes CUDA kernels (ref: captioner/models/blip2/blip2.py:
16-29, captioner/pseudocaptioner.py:48-65). TPU-native equivalent:
per-output-channel symmetric int8 weight quantization for every dense/conv
kernel in a param pytree. XLA lowers the int8 x bf16 matmul pattern
(dequantize-fused) natively on the MXU; HBM weight traffic halves vs bf16
and quarters vs f32 — the win that matters for the decode loop, which is
weight-bandwidth-bound at batch 1.

Usage:
    qparams = quantize_params(params)          # pytree with QuantizedArray
    dense(p, x) works unchanged: models.common.dense dequantizes on the fly
    via `maybe_dequant` (QuantizedArray is a pytree node).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class QuantizedArray(NamedTuple):
    """Symmetric per-channel int8 weight: w ≈ q * scale.

    q: int8 [..., out]; scale: f32 [out] (last-axis channels)."""

    q: jnp.ndarray
    scale: jnp.ndarray

    @property
    def shape(self):
        return self.q.shape

    @property
    def ndim(self):
        return self.q.ndim

    def dequantize(self, dtype=jnp.bfloat16) -> jnp.ndarray:
        return self.q.astype(dtype) * self.scale.astype(dtype)


def quantize_array(w: jnp.ndarray, axis: int = -1) -> QuantizedArray:
    """Per-channel symmetric int8 quantization along `axis`."""
    amax = jnp.max(jnp.abs(w), axis=tuple(
        i for i in range(w.ndim) if i != (axis % w.ndim)), keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return QuantizedArray(q, jnp.squeeze(scale).astype(jnp.float32))


def maybe_dequant(w: Any, dtype=jnp.bfloat16) -> jnp.ndarray:
    if isinstance(w, QuantizedArray):
        return w.dequantize(dtype)
    return w.astype(dtype)


import os as _os

# W8A8: quantize activations per token on the fly and run the matmul as
# int8 x int8 -> int32 on the MXU. On TPU generations where int8 dots run
# at 2x the bf16 rate this doubles matmul throughput; on THIS chip a fenced
# microbenchmark measured int8 == bf16 (130 TFLOP/s both, 4096^3 matmuls),
# so W8A8 only adds activation-quantization traffic — it is therefore
# OPT-IN via ECAP_W8A8=1; default serving uses weight-only int8 (halved
# weight HBM traffic, bf16 MXU).
_W8A8 = _os.environ.get("ECAP_W8A8", "0") == "1"


def w8a8_enabled() -> bool:
    return _W8A8


def dense_w8a8(x: jnp.ndarray, w: QuantizedArray) -> jnp.ndarray:
    """[..., in] x QuantizedArray[in, out] -> f32 [..., out] via an int8
    MXU matmul with dynamic symmetric per-token activation scales."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    sx = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127
                  ).astype(jnp.int8)
    y = jax.lax.dot_general(
        xq, w.q, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * sx * w.scale


MIN_QUANT_SIZE = 1 << 14  # don't quantize small tensors (biases, LN, ...)


def quantize_params(params: Any, min_size: int = MIN_QUANT_SIZE) -> Any:
    """Quantize every large weight matrix in a param pytree. Embeddings and
    2D+ kernels quantize per-output-channel; everything else stays f32."""

    def q(path, leaf):
        name = str(path[-1].key) if hasattr(path[-1], "key") else ""
        # only matmul/conv kernels ("w"); embeddings stay f32 (they are
        # indexed, not multiplied) and small tensors aren't worth it
        if name == "w" and leaf.ndim >= 2 and leaf.size >= min_size:
            return quantize_array(jnp.asarray(leaf))
        return leaf

    return jax.tree_util.tree_map_with_path(q, params)


def quantization_ratio(params: Any) -> float:
    """Fraction of parameter bytes stored as int8."""
    total = q8 = 0

    def count(leaf):
        nonlocal total, q8
        if isinstance(leaf, QuantizedArray):
            total_local = leaf.q.size
            q8_local = leaf.q.size
        else:
            total_local = leaf.size * 4
            q8_local = 0
        total += total_local
        q8 += q8_local

    jax.tree_util.tree_map(
        count, params,
        is_leaf=lambda x: isinstance(x, QuantizedArray))
    return q8 / max(total, 1)


# ---------------------------------------------------------------------------
# int8 cross-attention K/V (decode-loop activation quantization)
# ---------------------------------------------------------------------------

class QuantizedKV(NamedTuple):
    """Precomputed cross-attention K/V quantized to int8 for the decode
    loop, where re-reading the K/V of every multimodal layer each step is
    the dominant HBM traffic (ViT-L large preset: 12 layers x 50 MB x 29
    steps ~ 17 GB/generation in bf16; int8 halves it).

    Scales are constant along each einsum's CONTRACTED axis so they factor
    out exactly:
      kt: int8 [B, H, Dh, K], kt_scale f32 [B, H, K] (per key column —
          q·K contracts Dh)
      v:  int8 [B, K, H, Dh], v_scale f32 [B, H, Dh] (per value channel —
          w·V contracts K)
    """

    kt: jnp.ndarray
    kt_scale: jnp.ndarray
    v: jnp.ndarray
    v_scale: jnp.ndarray


def quantize_kv(kt: jnp.ndarray, v: jnp.ndarray) -> QuantizedKV:
    """kt [B, H, Dh, K] bf16, v [B, K, H, Dh] bf16 -> QuantizedKV."""
    kt_f = kt.astype(jnp.float32)
    amax_k = jnp.max(jnp.abs(kt_f), axis=2)              # [B, H, K]
    kt_scale = jnp.maximum(amax_k, 1e-8) / 127.0
    kt_q = jnp.clip(jnp.round(kt_f / kt_scale[:, :, None, :]),
                    -127, 127).astype(jnp.int8)
    v_f = v.astype(jnp.float32)
    amax_v = jnp.max(jnp.abs(v_f), axis=1)               # [B, H, Dh]
    v_scale = jnp.maximum(amax_v, 1e-8) / 127.0
    v_q = jnp.clip(jnp.round(v_f / v_scale[:, None, :, :]),
                   -127, 127).astype(jnp.int8)
    return QuantizedKV(kt_q, kt_scale, v_q, v_scale)



def int8_kv_enabled() -> bool:
    """Cross-KV int8 follows the int8 serving mode (engages only when the
    layer's projection weights are themselves QuantizedArray); ECAP_INT8_KV=0
    force-disables."""
    return _os.environ.get("ECAP_INT8_KV", "1") == "1"
