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
        return flash_attention(q, k, v, causal=causal)
    block = 128
    t_pad = ((t + block - 1) // block) * block
    if t_pad == t:
        return flash_attention(q, k, v, causal=causal)
    pad = ((0, 0), (0, 0), (0, t_pad - t), (0, 0))
    out = flash_attention(jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad),
                          causal=causal, valid_len=t)
    return out[:, :, :t]


def maybe_fused_preprocess(img_u8: jnp.ndarray, out_size: int, patch: int
                           ) -> Optional[jnp.ndarray]:
    if not pallas_enabled():
        return None
    if out_size % patch != 0:
        return None
    from .preprocess import fused_preprocess

    return fused_preprocess(img_u8, out_size, patch)
