"""Model-level tests: tokenizer, captioner (KV-cache consistency, generate,
perplexity), sentence encoder."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from embodied_captioning_tpu.config import (
    CaptionerConfig, SentenceEncoderConfig,
)
from embodied_captioning_tpu.models import tokenizer as T
from embodied_captioning_tpu.models.captioner import (
    caption_loss, forward, generate, init_captioner, perplexity,
)
from embodied_captioning_tpu.models.sbert import SentenceEncoder

CFG = CaptionerConfig.tiny()


@pytest.fixture(scope="module")
def cap_params():
    return init_captioner(jax.random.PRNGKey(0), CFG)


def _images(rng, n=2, size=64):
    return jnp.asarray((rng.random((n, size, size, 3)) * 255).astype(np.uint8))


def test_tokenizer_roundtrip():
    tok = T.default_tokenizer(1024)
    for s in ["a red couch in the living room", "tv on the wall!",
              "Ünïcode caption 123"]:
        assert tok.decode(tok.encode(s)) == s.strip()
    batch = tok.encode_batch(["a bed", "a very long caption " * 10], 16)
    assert batch.shape == (2, 16)
    assert batch[0, 0] == T.BOS_ID
    # deterministic retraining
    m1 = T.train_bpe(T.builtin_corpus(), 512)
    m2 = T.train_bpe(T.builtin_corpus(), 512)
    assert m1 == m2


def test_generate_shapes_and_determinism(cap_params, rng):
    imgs = _images(rng)
    t1, l1, n1 = generate(cap_params, imgs, jax.random.PRNGKey(1), CFG)
    t2, l2, n2 = generate(cap_params, imgs, jax.random.PRNGKey(2), CFG)
    # greedy decoding: key must not matter
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    assert t1.shape == (2, CFG.max_caption_len)
    # default: chosen-token log-probs (full [B, L-1, V] logits are opt-in)
    assert l1.shape == (2, CFG.max_caption_len - 1)
    assert (np.asarray(l1) <= 0).all()
    ppl = np.asarray(perplexity(l1, t1))
    assert (ppl > 0).all() and np.isfinite(ppl).all()


def test_generate_eos_early_exit(cap_params, rng):
    """When every row finishes, the scan's dead branch must still produce
    the contract outputs: PAD after EOS, PAD-masked log-probs, finite
    perplexity. Forcing EOS to dominate the head triggers it at step 1."""
    imgs = _images(rng)
    forced = dict(cap_params)
    head = dict(cap_params["head"])
    head["b"] = head["b"].at[T.EOS_ID].set(1e4)
    forced["head"] = head
    toks, logp, lengths = generate(forced, imgs, jax.random.PRNGKey(0), CFG)
    t = np.asarray(toks)
    assert (t[:, 1] == T.EOS_ID).all()
    assert (t[:, 2:] == T.PAD_ID).all()
    assert (np.asarray(lengths) == 2).all()
    ppl = np.asarray(perplexity(logp, toks))
    assert np.isfinite(ppl).all() and (ppl > 0).all()


def test_generate_matches_uncached_forward(cap_params, rng):
    """KV-cached decode must agree with the full (uncached) forward pass:
    teacher-forcing the generated tokens reproduces the same step logits."""
    imgs = _images(rng)
    toks, step_logits, _ = generate(cap_params, imgs, jax.random.PRNGKey(0),
                                    CFG, full_logits=True)
    full_logits, _, _ = forward(cap_params, imgs, toks, CFG)
    # step_logits[:, i] predicts token i+1 given prefix -> compare to
    # full_logits[:, i] (same position, causal)
    a = np.asarray(step_logits)
    b = np.asarray(full_logits[:, :-1])
    np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-2)
    # argmax agreement everywhere (the actual decode contract)
    np.testing.assert_array_equal(a.argmax(-1), b.argmax(-1))


def test_beam_search(cap_params, rng):
    from embodied_captioning_tpu.models.captioner import generate_beam

    imgs = _images(rng)
    bt, bs = generate_beam(cap_params, imgs, CFG, num_beams=3)
    assert bt.shape == (2, CFG.max_caption_len)
    assert np.isfinite(np.asarray(bs)).all()
    # beam=1 must reproduce greedy decoding exactly
    g, _, _ = generate(cap_params, imgs, jax.random.PRNGKey(0), CFG)
    b1, _ = generate_beam(cap_params, imgs, CFG, num_beams=1)
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(g))


def test_speculative_decode_exactness(cap_params, rng):
    """Self-speculative decoding must be bit-identical to greedy for any
    draft length/depth (incl. draft == full model: 100% acceptance)."""
    from embodied_captioning_tpu.models.captioner import generate_speculative

    imgs = _images(rng, n=3)
    g, _, _ = generate(cap_params, imgs, jax.random.PRNGKey(0), CFG)
    for dl, dy in [(2, CFG.text.cross_layers), (3, 1), (4, 0)]:
        s, lens = generate_speculative(cap_params, imgs, CFG, draft_len=dl,
                                       draft_layers=dy)
        np.testing.assert_array_equal(np.asarray(s), np.asarray(g),
                                      err_msg=f"dl={dl} layers={dy}")
    assert (np.asarray(lens) > 0).all()


def test_multi_token_cached_block_is_causal(cap_params, rng):
    """Teacher-forcing W tokens through the cache in ONE call must equal W
    single-token cached steps (regression: in-block causal masking)."""
    import jax.numpy as jnp

    from embodied_captioning_tpu.models.common import KVCache, block

    blk = cap_params["text_blocks"][0]
    heads = CFG.text.heads
    x = jnp.asarray(rng.standard_normal((2, 5, CFG.text.width)),
                    jnp.float32)
    c_multi = KVCache.create(2, 8, heads, CFG.text.width // heads)
    out_multi, _ = block(blk, x, heads, cache=c_multi)
    c_step = KVCache.create(2, 8, heads, CFG.text.width // heads)
    outs = []
    for i in range(5):
        o, c_step = block(blk, x[:, i:i + 1], heads, cache=c_step)
        outs.append(o)
    out_steps = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(out_multi), np.asarray(out_steps),
                               rtol=5e-2, atol=5e-2)


def test_sampling_modes(cap_params, rng):
    imgs = _images(rng, n=1)
    t_greedy, _, _ = generate(cap_params, imgs, jax.random.PRNGKey(0), CFG)
    t_topk, _, _ = generate(cap_params, imgs, jax.random.PRNGKey(0), CFG,
                            top_k=5, temperature=1.0)
    t_topp, _, _ = generate(cap_params, imgs, jax.random.PRNGKey(0), CFG,
                            top_p=0.9, temperature=0.8)
    assert t_topk.shape == t_greedy.shape == t_topp.shape


def test_caption_loss_grads(cap_params, rng):
    imgs = _images(rng)
    toks = jnp.asarray(np.random.default_rng(0).integers(4, 200, (2, 12)),
                       jnp.int32)
    (loss, aux), grads = jax.value_and_grad(
        lambda p: caption_loss(p, imgs, toks, CFG), has_aux=True)(cap_params)
    assert np.isfinite(float(loss))
    gnorm = jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(jnp.square(x)), grads, 0.0)
    assert float(gnorm) > 0.0


def test_sentence_encoder_semantics():
    se = SentenceEncoder.create(0, SentenceEncoderConfig.tiny())
    e = se.encode(["a red couch", "a red couch", "a potted plant"])
    assert e.shape == (3, 384)
    np.testing.assert_allclose(np.linalg.norm(e, axis=1), 1.0, atol=1e-4)
    # identical strings -> identical embeddings
    np.testing.assert_allclose(e[0], e[1], atol=1e-6)
    assert float(e[0] @ e[2]) < 0.9999


def test_headmajor_mha_matches_legacy_spelling(monkeypatch, rng):
    """The default uncached bf16 path projects QKV head-major end-to-end
    (common._mha_headmajor); ECAP_HEADMAJOR=0 restores the legacy
    dense->split_heads spelling. Same weights must agree to bf16 tolerance,
    for self-attention (causal and masked) and cross-attention."""
    import jax
    import jax.numpy as jnp

    from embodied_captioning_tpu.models import common as C

    key = jax.random.PRNGKey(3)
    k1, k2, k3 = jax.random.split(key, 3)
    d, h, tq, tk = 64, 4, 9, 7
    p = C.mha_init(k1, d, h)
    x = jax.random.normal(k2, (2, tq, d), jnp.float32)
    kv = jax.random.normal(k3, (2, tk, d), jnp.float32)
    mask = jnp.asarray(np.random.default_rng(0).random((2, 1, tq, tk)) > 0.3)

    self_mask = jnp.asarray(
        np.random.default_rng(1).random((2, 1, tq, tq)) > 0.3)
    cases = [dict(causal=True), dict(kv=kv), dict(kv=kv, mask=mask),
             # causal + explicit (non-tril) mask: both paths must AND them
             dict(causal=True, mask=self_mask)]
    for kw in cases:
        monkeypatch.setenv("ECAP_HEADMAJOR", "1")
        a, _ = C.mha(p, x, h, compute_dtype=jnp.bfloat16, **kw)
        monkeypatch.setenv("ECAP_HEADMAJOR", "0")
        b, _ = C.mha(p, x, h, compute_dtype=jnp.bfloat16, **kw)
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=0.06, atol=0.06)
        assert np.corrcoef(np.asarray(a, np.float32).ravel(),
                           np.asarray(b, np.float32).ravel())[0, 1] > 0.999


def test_generate_row_valid_skips_invalid_rows(cap_params, rng):
    """row_valid=False rows emit only PAD after BOS (length 1) and cost no
    decode steps; valid rows decode identically with or without invalid
    companions (greedy)."""
    imgs = _images(rng, n=3)
    valid = jnp.asarray([True, False, True])
    t_all, lp_all, len_all = generate(cap_params, imgs,
                                      jax.random.PRNGKey(0), CFG)
    t_v, lp_v, len_v = generate(cap_params, imgs, jax.random.PRNGKey(0),
                                CFG, row_valid=valid)
    t_v = np.asarray(t_v)
    assert int(len_v[1]) == 1
    assert (t_v[1, 1:] == T.PAD_ID).all() and t_v[1, 0] == T.BOS_ID
    # valid rows unchanged
    np.testing.assert_array_equal(t_v[0], np.asarray(t_all)[0])
    np.testing.assert_array_equal(t_v[2], np.asarray(t_all)[2])
    # all-invalid: the decode while_loop never runs
    t_none, _, len_none = generate(cap_params, imgs, jax.random.PRNGKey(0),
                                   CFG, row_valid=jnp.zeros((3,), bool))
    assert (np.asarray(len_none) == 1).all()
    assert (np.asarray(t_none)[:, 1:] == T.PAD_ID).all()


def test_cross_v_headmajor_parity(cap_params, rng, monkeypatch):
    """ECAP_CROSS_V_HEADMAJOR=1 stores the precomputed cross V head-major;
    greedy captions must match the default layout exactly (float path) for
    both float and int8-quantized serving params."""
    from embodied_captioning_tpu.models.quantize import quantize_params

    imgs = _images(rng, n=2)
    qparams = quantize_params(cap_params)
    for params in (cap_params, qparams):
        # env flags are read at TRACE time and generate is module-level
        # @jax.jit: clear the jit cache around each flip or the second call
        # silently reruns the first executable (vacuous test)
        monkeypatch.delenv("ECAP_CROSS_V_HEADMAJOR", raising=False)
        jax.clear_caches()
        t_a, lp_a, _ = generate(params, imgs, jax.random.PRNGKey(0), CFG)
        monkeypatch.setenv("ECAP_CROSS_V_HEADMAJOR", "1")
        jax.clear_caches()
        t_b, lp_b, _ = generate(params, imgs, jax.random.PRNGKey(0), CFG)
        np.testing.assert_array_equal(np.asarray(t_a), np.asarray(t_b))
        np.testing.assert_allclose(np.asarray(lp_a), np.asarray(lp_b),
                                   rtol=2e-2, atol=2e-2)
    jax.clear_caches()
