"""BLIP2-class captioner family + consensus LM."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from embodied_captioning_tpu.models import blip2 as B
from embodied_captioning_tpu.models import llm as L

CFG = B.Blip2Config.tiny()


@pytest.fixture(scope="module")
def params():
    return B.init_blip2(jax.random.PRNGKey(0), CFG)


def _imgs(rng, n=2):
    return jnp.asarray((rng.random((n, 64, 64, 3)) * 255).astype(np.uint8))


def test_blip2_generate_and_tf_parity(params, rng):
    imgs = _imgs(rng)
    toks, logits, lens = B.generate(params, imgs, jax.random.PRNGKey(1), CFG)
    assert toks.shape == (2, CFG.max_caption_len)
    tf = B.lm_logits(params, imgs, toks, CFG)
    np.testing.assert_array_equal(np.asarray(logits).argmax(-1),
                                  np.asarray(tf[:, :-1]).argmax(-1))


def test_blip2_scores_and_loss(params, rng):
    imgs = _imgs(rng)
    toks = jnp.asarray(np.random.default_rng(1).integers(4, 200, (2, 10)),
                       jnp.int32)
    itc = np.asarray(B.itc_score(params, imgs, toks, CFG))
    itm = np.asarray(B.itm_score(params, imgs, toks, CFG))
    assert itc.shape == (2,) and np.isfinite(itc).all()
    assert ((itm >= 0) & (itm <= 1)).all()
    loss, grads = jax.value_and_grad(
        lambda p: B.blip2_caption_loss(p, imgs, toks, CFG))(params)
    assert np.isfinite(float(loss))


def test_consensus_lm_choose():
    lm = L.ConsensusLM()
    caps = ["a red couch", "a large red sofa", "qqq zzz xxx"]
    chosen = lm.choose(caps)
    assert chosen in caps
    assert lm.choose(["only one"]) == "only one"


def test_lm_loss_and_score(rng):
    cfg = L.LMConfig.tiny()
    params = L.init_lm(jax.random.PRNGKey(0), cfg)
    toks = jnp.asarray(rng.integers(4, 200, (2, 12)), jnp.int32)
    loss, grads = jax.value_and_grad(
        lambda p: L.lm_loss(p, toks, cfg))(params)
    assert np.isfinite(float(loss))
    lp = L.sequence_log_prob(params, toks, cfg, jnp.asarray([1, 4]))
    assert lp.shape == (2,) and np.isfinite(np.asarray(lp)).all()
