"""Int8 weight quantization: roundtrip error, pytree-ness, end-to-end
quantized captioner generation."""

import jax
import jax.numpy as jnp
import numpy as np

from embodied_captioning_tpu.config import CaptionerConfig
from embodied_captioning_tpu.models.captioner import generate, init_captioner
from embodied_captioning_tpu.models.quantize import (
    QuantizedArray, maybe_dequant, quantization_ratio, quantize_array,
    quantize_params,
)


def test_quantize_roundtrip(rng):
    w = jnp.asarray(rng.standard_normal((256, 128)).astype(np.float32))
    q = quantize_array(w)
    assert q.q.dtype == jnp.int8
    assert q.scale.shape == (128,)
    back = np.asarray(q.dequantize(jnp.float32))
    err = np.abs(back - np.asarray(w)).max()
    # max error bounded by scale/2 per channel
    assert err <= float(np.asarray(q.scale).max())
    rel = np.linalg.norm(back - np.asarray(w)) / np.linalg.norm(np.asarray(w))
    assert rel < 0.01


def test_quantize_params_selective():
    cfg = CaptionerConfig.tiny()
    params = init_captioner(jax.random.PRNGKey(0), cfg)
    qp = quantize_params(params, min_size=1024)
    # some weights quantized, embeddings untouched
    assert isinstance(qp["head"]["w"], QuantizedArray)
    assert not isinstance(qp["tok_emb"], QuantizedArray)
    assert not isinstance(qp["ln_text"]["g"], QuantizedArray)
    assert quantization_ratio(qp) > 0.1
    # quantized pytree still jits (QuantizedArray is a NamedTuple)
    out = jax.jit(lambda p: maybe_dequant(p["head"]["w"]))(qp)
    assert out.dtype == jnp.bfloat16


def test_quantized_generation_agrees(rng):
    cfg = CaptionerConfig.tiny()
    params = init_captioner(jax.random.PRNGKey(0), cfg)
    imgs = jnp.asarray((rng.random((2, 64, 64, 3)) * 255).astype(np.uint8))
    t_full, _, _ = generate(params, imgs, jax.random.PRNGKey(1), cfg)
    qp = quantize_params(params, min_size=1024)
    t_q, logits_q, _ = generate(qp, imgs, jax.random.PRNGKey(1), cfg)
    assert t_q.shape == t_full.shape
    assert np.isfinite(np.asarray(logits_q)).all()
    # int8 round-off may flip some argmaxes on a random-init model; the
    # contract is that generation runs and mostly agrees
    agree = (np.asarray(t_q) == np.asarray(t_full)).mean()
    assert agree > 0.5


def test_w8a8_matmul_accuracy(rng):
    """int8 x int8 MXU path stays close to the f32 matmul."""
    from embodied_captioning_tpu.models.quantize import (
        dense_w8a8, quantize_array,
    )

    x = jnp.asarray(rng.standard_normal((4, 17, 256)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((256, 128)).astype(np.float32) * 0.05)
    ref = np.asarray(x @ w)
    got = np.asarray(dense_w8a8(x, quantize_array(w)))
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 0.05, err
    corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert corr > 0.999


def test_w8a8_toggle(monkeypatch):
    """ECAP_W8A8=0 falls back to the dequantize->bf16 path (same results
    contract as weight-only quantization)."""
    import embodied_captioning_tpu.models.quantize as Q

    monkeypatch.setattr(Q, "_W8A8", False)
    assert not Q.w8a8_enabled()
    monkeypatch.setattr(Q, "_W8A8", True)
    assert Q.w8a8_enabled()


def test_quantize_kv_attention_close(rng):
    """int8 cross-KV attention matches the bf16-KV result closely: scales
    lie along each einsum's contracted axis so they factor out exactly —
    only the int8 rounding of K/V remains."""
    from embodied_captioning_tpu.models.common import (
        cross_v_headmajor, mha, mha_init,
    )
    from embodied_captioning_tpu.models.quantize import quantize_kv

    b, h, dh, kl, d = 2, 4, 16, 10, 64
    p = mha_init(jax.random.PRNGKey(0), d, h)
    x = jnp.asarray(rng.standard_normal((b, 1, d)), jnp.float32)
    kt = jnp.asarray(rng.standard_normal((b, h, dh, kl)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, kl, h, dh)), jnp.bfloat16)
    # quantize_kv takes [B, K, H, Dh]; mha's precomputed-V layout contract
    # follows cross_v_headmajor() (the precompute_kv transpose), so mirror
    # it here (ref round-3 default: head-major [B, H, K, Dh])
    qkv = quantize_kv(kt, v)
    v_f = v
    if cross_v_headmajor():
        v_f = jnp.transpose(v, (0, 2, 1, 3))
        qkv = qkv._replace(v=jnp.transpose(qkv.v, (0, 2, 1, 3)))
    out_f, _ = mha(p, x, h, kv_precomputed=(kt, v_f))
    out_q, _ = mha(p, x, h, kv_precomputed=qkv)
    a = np.asarray(out_f, np.float32)
    bq = np.asarray(out_q, np.float32)
    # int8 K/V rounding is ~0.4% relative; attention keeps it small
    assert np.max(np.abs(a - bq)) < 0.08, np.max(np.abs(a - bq))
    # and the quantized buffers really are int8
    qkv = quantize_kv(kt, v)
    assert qkv.kt.dtype == jnp.int8 and qkv.v.dtype == jnp.int8


def test_int8_kv_engages_only_with_quantized_weights(monkeypatch):
    from embodied_captioning_tpu.models.common import precompute_kv, mha_init
    from embodied_captioning_tpu.models.quantize import (
        QuantizedKV, quantize_params,
    )

    monkeypatch.delenv("ECAP_INT8_KV", raising=False)  # ambient shell value
    p = mha_init(jax.random.PRNGKey(0), 64, 4)
    src = jnp.ones((2, 6, 64), jnp.bfloat16)
    out = precompute_kv(p, src, 4)
    assert not isinstance(out, QuantizedKV)  # float weights -> float KV
    qp = quantize_params(p, min_size=16)
    assert isinstance(precompute_kv(qp, src, 4), QuantizedKV)
    monkeypatch.setenv("ECAP_INT8_KV", "0")
    assert not isinstance(precompute_kv(qp, src, 4), QuantizedKV)
