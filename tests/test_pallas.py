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


def test_flash_attention_blocked_path(rng):
    # t > MAX_SINGLE_BLOCK_T exercises the streaming-flash recurrence
    b, h, t, d = 1, 2, 768, 32
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    out = flash_attention(q, k, v, causal=True, block_q=128, block_k=128,
                          interpret=True)
    ref = attention_reference(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3,
                               atol=2e-3)


def test_layernorm_kernel_parity(rng):
    from embodied_captioning_tpu.models.common import _layernorm_ref
    from embodied_captioning_tpu.ops.pallas.layernorm import layernorm_nd

    for dtype in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(rng.standard_normal((3, 333, 256)), dtype)
        g = jnp.asarray(rng.standard_normal((256,)), jnp.float32)
        b = jnp.asarray(rng.standard_normal((256,)), jnp.float32)
        out = layernorm_nd(x, g, b, interpret=True)
        ref = _layernorm_ref(x, g, b, 1e-5, dtype)
        assert out.dtype == ref.dtype
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=2e-2, atol=2e-2)


def test_ln_barrier_toggle_is_identity(monkeypatch, rng):
    # ECAP_LN_BARRIER wraps LN inputs in lax.optimization_barrier — a
    # scheduling hint only; it may change fusion (and hence float
    # reassociation) but not semantics, and the flag must be read lazily
    # (monkeypatch-able at trace time).
    from embodied_captioning_tpu.models import common

    x = jnp.asarray(rng.standard_normal((5, 64)), jnp.float32)
    p = {"g": jnp.asarray(rng.standard_normal((64,)), jnp.float32),
         "b": jnp.asarray(rng.standard_normal((64,)), jnp.float32)}
    monkeypatch.delenv("ECAP_LN_BARRIER", raising=False)
    base = jax.jit(lambda p, x: common.layernorm(p, x))(p, x)
    monkeypatch.setenv("ECAP_LN_BARRIER", "1")
    barr = jax.jit(lambda p, x: common.layernorm(p, x))(p, x)
    np.testing.assert_allclose(np.asarray(base), np.asarray(barr),
                               rtol=1e-6, atol=1e-6)


def test_layernorm_custom_vjp_matches_ref_grads(rng):
    # the TPU fast path routes through _ln_pallas (custom_vjp); its backward
    # must match autodiff through the reference formulation
    from embodied_captioning_tpu.models.common import (
        _layernorm_ref, _ln_pallas_bwd,
    )

    x = jnp.asarray(rng.standard_normal((64, 128)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((128,)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((128,)), jnp.float32)
    dy = jnp.asarray(rng.standard_normal((64, 128)), jnp.float32)

    def scalar_ref(x, g, b):
        return jnp.sum(_layernorm_ref(x, g, b, 1e-5, jnp.float32) * dy)

    dx_ref, dg_ref, db_ref = jax.grad(scalar_ref, argnums=(0, 1, 2))(x, g, b)
    dx, dg, db = _ln_pallas_bwd(1e-5, (x, g, b), dy)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(dg), np.asarray(dg_ref), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(db), np.asarray(db_ref), rtol=1e-4,
                               atol=1e-4)


def test_decode_self_attention_parity():
    """Fused single-query cached self-attention == the mha reference math
    (interpret mode)."""
    from embodied_captioning_tpu.ops.pallas.decode_attention import (
        decode_self_attention,
    )

    b, h, dh, t = 4, 3, 8, 16
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, dh)).astype(np.float32))
    kt = jnp.asarray(rng.standard_normal((b, h, dh, t)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, t, h, dh)).astype(np.float32))
    pos = 9
    out = decode_self_attention(q, kt, v, jnp.int32(pos), interpret=True)
    # reference
    s = jnp.einsum("bhd,bhdt->bht", q, kt) / np.sqrt(dh)
    live = np.arange(t) <= pos
    s = jnp.where(jnp.asarray(live)[None, None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    ref = jnp.einsum("bht,bthd->bhd", p, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_decode_cross_attention_parity():
    """Fused single-query cross-attention (head-major V, int8 + scales) ==
    the mha int8-KV reference math (interpret mode)."""
    from embodied_captioning_tpu.ops.pallas.decode_attention import (
        decode_cross_attention,
    )

    b, h, dh, k = 4, 3, 8, 32
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((b, h, dh)).astype(np.float32))
    kt8 = jnp.asarray(rng.integers(-127, 127, (b, h, dh, k)).astype(np.int8))
    v8 = jnp.asarray(rng.integers(-127, 127, (b, h, k, dh)).astype(np.int8))
    ks = jnp.asarray((rng.random((b, h, k)) * 0.02 + 0.001).astype(np.float32))
    vs = jnp.asarray((rng.random((b, h, dh)) * 0.02 + 0.001).astype(np.float32))
    out = decode_cross_attention(q, kt8, v8, ks, vs, block_b=2,
                                 interpret=True)
    s = jnp.einsum("bhd,bhdk->bhk", q, kt8.astype(jnp.float32)) / np.sqrt(dh)
    s = s * ks
    p = jax.nn.softmax(s, axis=-1)
    ref = jnp.einsum("bhk,bhkd->bhd", p, v8.astype(jnp.float32)) * vs
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    # float path (no scales)
    outf = decode_cross_attention(q, kt8.astype(jnp.float32) * 0.01,
                                  v8.astype(jnp.float32) * 0.01,
                                  interpret=True)
    sf = jnp.einsum("bhd,bhdk->bhk", q, kt8.astype(jnp.float32) * 0.01
                    ) / np.sqrt(dh)
    pf = jax.nn.softmax(sf, axis=-1)
    reff = jnp.einsum("bhk,bhkd->bhd", pf, v8.astype(jnp.float32) * 0.01)
    np.testing.assert_allclose(np.asarray(outf), np.asarray(reff),
                               rtol=1e-4, atol=1e-4)


def test_generate_with_decode_kernels_matches_xla(monkeypatch):
    """ECAP_USE_PALLAS=1 + ECAP_CROSS_V_HEADMAJOR=1 routes the decode's
    self- and cross-attention through the fused kernels (interpreted on
    CPU); greedy captions must match the XLA path."""
    from embodied_captioning_tpu.config import CaptionerConfig
    from embodied_captioning_tpu.models.captioner import (
        generate, init_captioner,
    )
    from embodied_captioning_tpu.models.quantize import quantize_params

    cfg = CaptionerConfig.tiny()
    params = init_captioner(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray((rng.random((2, 64, 64, 3)) * 255).astype(np.uint8))
    for p in (params, quantize_params(params)):
        # generate is module-level @jax.jit and env flags are read at TRACE
        # time: flipping the env without clearing the jit cache would rerun
        # the previously traced executable and make this test vacuous
        monkeypatch.delenv("ECAP_USE_PALLAS", raising=False)
        monkeypatch.delenv("ECAP_CROSS_V_HEADMAJOR", raising=False)
        jax.clear_caches()
        t_ref, lp_ref, _ = generate(p, imgs, jax.random.PRNGKey(0), cfg)
        monkeypatch.setenv("ECAP_USE_PALLAS", "1")
        monkeypatch.setenv("ECAP_CROSS_V_HEADMAJOR", "1")
        jax.clear_caches()
        t_k, lp_k, _ = generate(p, imgs, jax.random.PRNGKey(0), cfg)
        np.testing.assert_array_equal(np.asarray(t_ref), np.asarray(t_k))
        np.testing.assert_allclose(np.asarray(lp_ref), np.asarray(lp_k),
                                   rtol=5e-2, atol=5e-2)
        # whole-block kernels (separately gated: Mosaic rejects them at
        # serving dims, but the interpret path must stay correct)
        monkeypatch.setenv("ECAP_PALLAS_BLOCKS", "1")
        jax.clear_caches()
        t_b, lp_b, _ = generate(p, imgs, jax.random.PRNGKey(0), cfg)
        monkeypatch.delenv("ECAP_PALLAS_BLOCKS", raising=False)
        np.testing.assert_array_equal(np.asarray(t_ref), np.asarray(t_b))
        np.testing.assert_allclose(np.asarray(lp_ref), np.asarray(lp_b),
                                   rtol=5e-2, atol=5e-2)
    jax.clear_caches()  # don't leak kernel-path traces to other tests


def test_decode_mlp_kernel_parity():
    """Fused residual+LN+MLP == the reference composition (interpret),
    float and int8 weights."""
    from embodied_captioning_tpu.models.common import (
        layernorm, layernorm_init, mlp, mlp_init,
    )
    from embodied_captioning_tpu.ops.pallas.decode_attention import decode_mlp

    d, f = 64, 256
    key = jax.random.PRNGKey(0)
    p_mlp = mlp_init(key, d, f)
    p_ln = layernorm_init(d)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 1, d),
                          jnp.float32).astype(jnp.bfloat16)
    ref = x + mlp(p_mlp, layernorm(p_ln, x))
    ones_f = jnp.ones((f,), jnp.float32)
    ones_d = jnp.ones((d,), jnp.float32)
    out = decode_mlp(x[:, 0], p_ln["g"], p_ln["b"],
                     p_mlp["fc"]["w"], ones_f, p_mlp["fc"]["b"],
                     p_mlp["proj"]["w"], ones_d, p_mlp["proj"]["b"],
                     interpret=True)[:, None]
    a = np.asarray(out, np.float32)
    b = np.asarray(ref, np.float32)
    np.testing.assert_allclose(a, b, rtol=0.05, atol=0.05)
    assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.999


def test_decode_self_block_kernel_parity():
    """Fused LN1+QKV+cache-write+attention+out-proj+residual == the mha
    composition block() runs (interpret mode), including the cache update."""
    from embodied_captioning_tpu.models.common import (
        KVCache, layernorm, layernorm_init, mha, mha_init,
    )
    from embodied_captioning_tpu.ops.pallas.decode_attention import (
        decode_self_block,
    )

    d, heads, t, bsz = 64, 4, 12, 8
    dh = d // heads
    p = mha_init(jax.random.PRNGKey(0), d, heads)
    p_ln = layernorm_init(d)
    p_ln["g"] = p_ln["g"] * 1.1
    p_ln["b"] = p_ln["b"] + 0.05
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((bsz, 1, d)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    pos = 5
    kc = jnp.asarray(rng.standard_normal((bsz, heads, dh, t)),
                     jnp.bfloat16)
    vc = jnp.asarray(rng.standard_normal((bsz, t, heads, dh)),
                     jnp.bfloat16)
    # reference: mha on a cache at index pos (same pre-filled buffers)
    cache = KVCache(kc, vc, jnp.int32(pos))
    h_ref, cache_ref = mha(p, layernorm(p_ln, x), heads, cache=cache)
    ref = np.asarray((x + h_ref).astype(jnp.float32))

    ones = jnp.ones((d,), jnp.float32)
    out, k_cur, v_cur = decode_self_block(
        x[:, 0], p_ln["g"], p_ln["b"],
        p["q"]["w"], ones, p["q"]["b"], p["k"]["w"], ones, p["k"]["b"],
        p["v"]["w"], ones, p["v"]["b"], p["o"]["w"], ones, p["o"]["b"],
        kc, vc, jnp.int32(pos), heads=heads, interpret=True)
    a = np.asarray(out, np.float32)[:, None]
    np.testing.assert_allclose(a, ref, rtol=0.06, atol=0.06)
    assert np.corrcoef(a.ravel(), ref.ravel())[0, 1] > 0.999
    # cache update parity: the kernel emits the current token's k/v and the
    # dispatcher writes them at `pos` (same dynamic_update_slice as mha)
    k_new = jax.lax.dynamic_update_slice(
        kc, k_cur.reshape(bsz, heads, dh)[..., None], (0, 0, 0, pos))
    v_new = jax.lax.dynamic_update_slice(
        vc, v_cur.reshape(bsz, 1, heads, dh), (0, pos, 0, 0))
    np.testing.assert_allclose(
        np.asarray(k_new, np.float32), np.asarray(cache_ref.k, np.float32),
        rtol=0.05, atol=0.05)
    np.testing.assert_allclose(
        np.asarray(v_new, np.float32), np.asarray(cache_ref.v, np.float32),
        rtol=0.05, atol=0.05)


def test_decode_cross_block_kernel_parity(monkeypatch):
    """Fused LN_x + q-proj + cross-attention + out-proj + residual == the
    mha composition (interpret mode), float and int8-scaled K/V. The mha
    reference is pinned to the legacy [B,K,H,Dh] V layout (flag off) to
    match the v_km fixture regardless of the session default."""
    monkeypatch.setenv("ECAP_CROSS_V_HEADMAJOR", "0")
    from embodied_captioning_tpu.models.common import (
        layernorm, layernorm_init, mha, mha_init,
    )
    from embodied_captioning_tpu.ops.pallas.decode_attention import (
        decode_cross_block,
    )

    d, heads, k, bsz = 64, 4, 24, 8
    dh = d // heads
    p = mha_init(jax.random.PRNGKey(2), d, heads)
    p_ln = layernorm_init(d)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((bsz, 1, d)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    kt = jnp.asarray(rng.standard_normal((bsz, heads, dh, k)),
                     jnp.bfloat16)
    v_km = jnp.asarray(rng.standard_normal((bsz, k, heads, dh)),
                       jnp.bfloat16)  # [B,K,H,Dh] for the mha reference
    h_ref, _ = mha(p, layernorm(p_ln, x), heads, kv_precomputed=(kt, v_km))
    ref = np.asarray((x + h_ref).astype(jnp.float32))
    ones = jnp.ones((d,), jnp.float32)
    out = decode_cross_block(
        x[:, 0], p_ln["g"], p_ln["b"], p["q"]["w"], ones, p["q"]["b"],
        p["o"]["w"], ones, p["o"]["b"], kt,
        jnp.transpose(v_km, (0, 2, 1, 3)), heads=heads, block_b=4,
        interpret=True)
    a = np.asarray(out, np.float32)[:, None]
    np.testing.assert_allclose(a, ref, rtol=0.06, atol=0.06)
    assert np.corrcoef(a.ravel(), ref.ravel())[0, 1] > 0.999


def test_raycast_kernel_edge_cases(rng):
    """ops/pallas/raycast vs the XLA argmin/min spelling on adversarial
    inputs: all-miss rays (t_best inf, best 0 — argmin-over-inf
    semantics), invalid boxes (never hit), duplicate boxes (first-index
    tie-break), and zero-component ray directions (clamped inv)."""
    from embodied_captioning_tpu.ops.pallas.raycast import raycast_minargmin

    nb, h, w = 7, 16, 128
    box_min = rng.uniform(-4, 4, (nb, 3)).astype(np.float32)
    box_max = (box_min + rng.uniform(0.2, 2.0, (nb, 3))).astype(np.float32)
    box_min[3] = box_min[2]          # duplicate box -> tie on every hit
    box_max[3] = box_max[2]
    valid = np.ones((nb,), bool)
    valid[5] = False                 # invalid box must never win
    origin = np.zeros((3,), np.float32)

    dirs = rng.standard_normal((h, w, 3)).astype(np.float32)
    dirs[0, :, :] = np.array([0.0, 0.0, 1.0])   # zero x/y components
    dirs[1, :, :] = np.array([0.0, 1.0, 0.0])
    inv = (1.0 / np.where(np.abs(dirs) < 1e-8,
                          np.where(dirs >= 0, 1e-8, -1e-8), dirs)
           ).astype(np.float32)   # keep the reference in f32 like the sim

    # XLA reference (the spelling in envs/sim.render)
    t0 = (box_min[None, None] - origin) * inv[:, :, None, :]
    t1 = (box_max[None, None] - origin) * inv[:, :, None, :]
    t_near = np.max(np.minimum(t0, t1), axis=-1)
    t_far = np.min(np.maximum(t0, t1), axis=-1)
    hit = (t_near <= t_far) & (t_far > 1e-4) & valid[None, None]
    t_hit = np.where(hit, np.maximum(t_near, 1e-4), np.inf)
    ref_best = np.argmin(t_hit, axis=-1)
    ref_t = np.min(t_hit, axis=-1)
    assert not np.isfinite(ref_t).all()          # some rays miss everything
    assert (ref_best[np.isfinite(ref_t)] != 5).all()

    t_best, best = raycast_minargmin(
        jnp.asarray(box_min - origin), jnp.asarray(box_max - origin),
        jnp.asarray(valid), jnp.asarray(inv), interpret=True)
    np.testing.assert_array_equal(np.asarray(t_best), ref_t)
    np.testing.assert_array_equal(np.asarray(best), ref_best)
