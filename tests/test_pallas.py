"""Pallas kernel parity tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from embodied_captioning_tpu.ops.pallas.flash_attention import (
    attention_reference, flash_attention,
)
from embodied_captioning_tpu.ops.pallas.preprocess import fused_preprocess
from embodied_captioning_tpu.ops.image import preprocess_for_vit


@pytest.mark.parametrize("causal", [False, True])
def test_flash_attention_parity(causal, rng):
    b, h, t, d = 2, 2, 256, 32
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    out = flash_attention(q, k, v, causal=causal, block_q=128, block_k=128,
                          interpret=True)
    ref = attention_reference(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3,
                               atol=2e-3)


def test_flash_attention_single_block(rng):
    q = jnp.asarray(rng.standard_normal((1, 1, 128, 16)), jnp.float32)
    out = flash_attention(q, q, q, interpret=True)
    ref = attention_reference(q, q, q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3,
                               atol=2e-3)


def test_fused_preprocess_parity(rng):
    img = jnp.asarray((rng.random((48, 48, 3)) * 255).astype(np.uint8))
    out = fused_preprocess(img, out_size=32, patch=8, interpret=True)
    ref = preprocess_for_vit(img[None], 32, 8)[0]
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-4)


def test_flash_attention_padded_masked(rng):
    """Odd sequence length via zero-pad + static valid_len masking."""
    b, h, t, d = 1, 2, 197, 16
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    pad = ((0, 0), (0, 0), (0, 256 - t), (0, 0))
    out = flash_attention(jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad),
                          valid_len=t, interpret=True)[:, :, :t]
    ref = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3,
                               atol=2e-3)


def test_dispatch_gating(monkeypatch, rng):
    from embodied_captioning_tpu.ops.pallas import dispatch

    q = jnp.zeros((1, 1, 256, 32))
    monkeypatch.setenv("ECAP_USE_PALLAS", "0")
    assert dispatch.maybe_flash_attention(q, q, q) is None
    # non-qualifying shape returns None even when enabled
    monkeypatch.setenv("ECAP_USE_PALLAS", "1")
    small = jnp.zeros((1, 1, 60, 32))
    assert dispatch.maybe_flash_attention(small, small, small) is None
