"""Sequence parallelism (ring attention over a `seq` mesh axis).

Correctness bar: ring attention must equal dense softmax attention exactly
(up to f32 reassociation) including ragged key-padding, and the
sequence-parallel ViT encode must match `models/vit.vit_features` — the
token axis actually sharded over 8 devices, a pad remainder in play
(T+1 = 17 tokens over 8 devices -> 24 padded), and parity through real
pre-LN blocks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from embodied_captioning_tpu.config import VitConfig
from embodied_captioning_tpu.models import vit as VIT
from embodied_captioning_tpu.parallel.sequence import (
    ring_attention, vit_features_seqparallel,
)


def _dense_attention(q, k, v, key_valid):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(q.shape[-1])
    s = jnp.where(key_valid[:, None, None, :], s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


@pytest.fixture(scope="module")
def seq_mesh():
    return Mesh(np.asarray(jax.devices()), ("seq",))


def test_ring_attention_matches_dense(seq_mesh, rng):
    b, h, t, d = 2, 4, 32, 16  # t = 4 tokens/device on the 8-ring
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    # ragged validity incl. a fully-invalid device block (keys 24..31 of
    # row 0) — the online softmax must not let masked blocks leak exp(0)
    valid = np.ones((b, t), bool)
    valid[0, 24:] = False
    valid[1, 5:9] = False
    valid = jnp.asarray(valid)

    out = ring_attention(q, k, v, seq_mesh, key_valid=valid)
    ref = _dense_attention(q, k, v, valid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_ring_attention_sharded_inputs(seq_mesh, rng):
    """Same result when q/k/v arrive already sharded on the token axis
    (the in-jit usage: sharding propagated from upstream pointwise ops)."""
    b, h, t, d = 1, 2, 16, 8
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    sh = jax.NamedSharding(seq_mesh, P(None, None, "seq", None))
    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))
    out = ring_attention(qs, ks, vs, seq_mesh)
    ref = _dense_attention(q, k, v, jnp.ones((b, t), bool))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_vit_features_seqparallel_matches_dense(seq_mesh, rng):
    cfg = VitConfig(image_size=56, patch_size=14, width=64, layers=2,
                    heads=4, pool_queries=4, pool_heads=2, embed_dim=32)
    params = VIT.init_vit(jax.random.PRNGKey(0), cfg)
    # 16 patches + cls = 17 tokens -> padded to 24 over the 8-device axis
    patch_dim = cfg.patch_size * cfg.patch_size * 3
    toks = jnp.asarray(rng.standard_normal((2, 16, patch_dim)), jnp.float32)

    ref = VIT.vit_features(params, toks, cfg)
    out = vit_features_seqparallel(params, toks, cfg, seq_mesh)
    assert out.shape == ref.shape == (2, 17, cfg.width)
    # bf16 residual stream on both sides; the only differences are ring
    # reassociation of the softmax accumulations
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=3e-2, rtol=3e-2)
