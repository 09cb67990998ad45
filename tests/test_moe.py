"""Expert-parallel MoE MLP (parallel/moe.py).

Bars: (1) with top_k = E and unconstrained capacity the layer must equal
the explicit mixture sum_e p_e * mlp_e(x) (the routing/dispatch/combine
matmuls reduce to an exact dense mixture); (2) sharding the expert axis
over a 4-device mesh must not change results; (3) deterministic capacity
overflow drops the LATEST tokens, not arbitrary ones; (4) the Switch
balance loss is 1 at a uniform gate and larger when collapsed."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from embodied_captioning_tpu.parallel.moe import (
    load_balance_loss, moe_init, moe_mlp, shard_experts,
)

DIM, HID, E = 16, 32, 4


@pytest.fixture(scope="module")
def moe_setup():
    params = moe_init(jax.random.PRNGKey(0), DIM, HID, E)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, DIM)), jnp.float32)
    return params, x


def _dense_mixture(p, x):
    """Explicit mixture: every token through every expert, gate-weighted."""
    b, t, d = x.shape
    xf = x.reshape(-1, d)
    logits = xf @ p["gate"]["w"] + p["gate"]["b"]
    probs = jax.nn.softmax(logits, axis=-1)
    outs = []
    for e in range(E):
        h = jax.nn.gelu(xf @ p["fc_w"][e] + p["fc_b"][e])
        outs.append(h @ p["proj_w"][e] + p["proj_b"][e])
    out = sum(probs[:, e:e + 1] * outs[e] for e in range(E))
    return out.reshape(b, t, d)


def test_moe_topk_all_equals_dense_mixture(moe_setup):
    p, x = moe_setup
    out = moe_mlp(p, x, capacity_factor=float(E), top_k=E,
                  compute_dtype=jnp.float32)
    ref = _dense_mixture(p, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_moe_expert_sharded_matches_single_device(moe_setup):
    p, x = moe_setup
    ref = moe_mlp(p, x, compute_dtype=jnp.float32)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("expert",))
    sp = shard_experts(p, mesh)
    for name in ("fc_w", "fc_b", "proj_w", "proj_b"):
        assert "expert" in str(sp[name].sharding.spec)
    out = moe_mlp(sp, x, mesh=mesh, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_moe_capacity_overflow_drops_latest(moe_setup):
    p, _ = moe_setup
    # all 8 tokens identical -> all take the same top-1 expert; with top_k=1
    # and capacity 1.0/E factor the expert queue holds only ceil(8/4)=2
    rng = np.random.default_rng(1)
    tok = rng.standard_normal((1, DIM)).astype(np.float32)
    x = jnp.asarray(np.repeat(tok, 8, 0)[None])          # [1, 8, DIM]
    out = moe_mlp(p, x, capacity_factor=1.0, top_k=1,
                  compute_dtype=jnp.float32)
    out = np.asarray(out)[0]
    nz = np.abs(out).sum(-1) > 1e-6
    assert nz[:2].all() and not nz[2:].any(), nz


def test_moe_grouped_matches_single_group(moe_setup):
    """Routing in groups must equal the flat single group when every group
    has headroom (cf covers the worst per-group load), and must error on
    top_k > E."""
    p, x = moe_setup
    ref = moe_mlp(p, x, capacity_factor=float(E), top_k=2,
                  compute_dtype=jnp.float32)
    out = moe_mlp(p, x, capacity_factor=float(E), top_k=2, group_size=4,
                  compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    # group padding: 16 tokens in groups of 5 -> 4 groups, 4 pad tokens
    out_pad = moe_mlp(p, x, capacity_factor=float(E), top_k=2, group_size=5,
                      compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out_pad), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    with pytest.raises(ValueError):
        moe_mlp(p, x, top_k=E + 1)


def test_moe_captioner_trains_and_generates():
    """End-to-end: a tiny captioner with MoE unimodal MLPs
    (TextDecoderConfig.moe_experts=2) forwards, improves its caption loss
    over a few steps, and generates with the KV-cached decode loop."""
    import dataclasses

    from embodied_captioning_tpu.config import CaptionerConfig
    from embodied_captioning_tpu.models.captioner import (
        caption_loss, generate, init_captioner,
    )
    from embodied_captioning_tpu.train.captioner_train import (
        create_train_state, train_step,
    )

    tiny = CaptionerConfig.tiny()
    cfg = dataclasses.replace(
        tiny, text=dataclasses.replace(tiny.text, moe_experts=2))
    params = init_captioner(jax.random.PRNGKey(0), cfg)
    for blk in params["text_blocks"]:
        assert "moe" in blk and "mlp" not in blk
        assert blk["moe"]["fc_w"].shape[0] == 2

    rng = np.random.default_rng(0)
    imgs = jnp.asarray((rng.random((4, 64, 64, 3)) * 255).astype(np.uint8))
    toks = jnp.asarray(rng.integers(3, 1000, (4, 12)).astype(np.int32))
    state = create_train_state(params, lr=3e-3)
    l0, _ = caption_loss(state.params, imgs, toks, cfg)
    for _ in range(8):
        state, aux = train_step(state, imgs, toks,
                                jnp.zeros(4, jnp.int32),
                                jnp.ones(4, bool), cfg, lr=3e-3)
    l1, _ = caption_loss(state.params, imgs, toks, cfg)
    assert float(l1) < float(l0), (float(l0), float(l1))

    out, _, lengths = generate(state.params, imgs[:2],
                               jax.random.PRNGKey(1), cfg)
    assert out.shape == (2, cfg.max_caption_len)
    assert int(jnp.max(lengths)) >= 1


def test_balance_loss(moe_setup):
    p, x = moe_setup
    # uniform gate: zero the gate weights -> every prob = 1/E, loss -> 1
    pu = dict(p, gate={"w": jnp.zeros_like(p["gate"]["w"]),
                       "b": jnp.zeros_like(p["gate"]["b"])})
    l_uniform = float(load_balance_loss(pu, x))
    assert abs(l_uniform - 1.0) < 1e-5
    # collapsed gate: huge bias on expert 0 -> loss -> E
    pc = dict(p, gate={"w": jnp.zeros_like(p["gate"]["w"]),
                       "b": jnp.asarray([100.0, 0, 0, 0])})
    assert float(load_balance_loss(pc, x)) > 3.5
    # probs reuse from the layer forward: same loss, no gate recompute
    out, probs = moe_mlp(pu, x, compute_dtype=jnp.float32,
                         return_gate_probs=True)
    assert out.shape == x.shape
    l_reused = float(load_balance_loss(pu, x, gate_probs=probs))
    assert abs(l_reused - l_uniform) < 1e-5
