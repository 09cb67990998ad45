"""CoCa-class image captioner: ViT encoder + unimodal text decoder +
multimodal cross-attention decoder, with KV-cached autoregressive generation.

Architecture parity with the reference's vendored open_clip CoCa
(ref: captioner/models/coca/coca_model.py:205-333): text tower produces
token features + a CLS text embedding (contrastive head); the multimodal
tower cross-attends pooled image tokens and predicts the next token.

The decisive TPU improvement over the reference: generation uses a KV cache
and decodes a whole *batch of crops* in one `lax.scan` (the reference re-runs
the full decoder per token with no cache — SURVEY.md §5 flags this as the
single biggest latency win). Per-step logits are returned for perplexity
(ref: captioner/captioning_predictor.py:34-47).
"""

from __future__ import annotations

import functools
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import CaptionerConfig
from .common import (
    KVCache, Params, block, block_init, causal_mask, dense, dense_init,
    embedding_init, layernorm, layernorm_init,
)
# Default special ids (the framework tokenizer's layout). Every generation/
# loss function shadows these with cfg.text.{pad,bos,eos}_id so ported real
# checkpoints (CLIP BPE: pad=0, bos=49406, eos=49407) decode correctly.
from .tokenizer import BOS_ID, EOS_ID, PAD_ID
from .vit import attentional_pool, encode_image, init_vit, vit_features


def init_captioner(key, cfg: CaptionerConfig) -> Params:
    kv, kt, km, ke, kc, kp = jax.random.split(key, 6)
    t = cfg.text
    text_blocks = [block_init(jax.random.fold_in(kt, i), t.width, t.heads,
                              t.mlp_ratio) for i in range(t.layers)]
    if t.moe_experts > 0:
        # swap the unimodal MLPs for mixture-of-experts layers (top-2
        # routing, parallel/moe.py); block() dispatches on the "moe" key
        from ..parallel.moe import moe_init

        for i, blk in enumerate(text_blocks):
            del blk["mlp"]
            blk["moe"] = moe_init(jax.random.fold_in(kt, 1000 + i), t.width,
                                  int(t.width * t.mlp_ratio), t.moe_experts)
    mm_blocks = [block_init(jax.random.fold_in(km, i), t.width, t.heads,
                            t.mlp_ratio, cross_dim=cfg.vision.width)
                 for i in range(t.cross_layers)]
    return {
        "vision": init_vit(kv, cfg.vision),
        "tok_emb": embedding_init(ke, t.vocab_size, t.width),
        "pos_emb": jax.random.normal(kp, (t.context_length, t.width)) * 0.01,
        "text_blocks": text_blocks,
        "mm_blocks": mm_blocks,
        "ln_text": layernorm_init(t.width),
        "ln_mm": layernorm_init(t.width),
        "text_proj": dense_init(kc, t.width, cfg.vision.embed_dim),
        "head": dense_init(jax.random.fold_in(kc, 1), t.width, t.vocab_size),
        "logit_scale": jnp.asarray(2.659, jnp.float32),  # ln(1/0.07)
    }


# ---------------------------------------------------------------------------
# forward (training) path
# ---------------------------------------------------------------------------

def _text_tower(params: Params, tokens: jnp.ndarray, cfg: CaptionerConfig,
                ) -> jnp.ndarray:
    t = tokens.shape[1]
    # bf16 residual stream (tok/pos embeddings are f32 master params; the
    # add would otherwise promote every block's residuals to f32)
    x = (params["tok_emb"][tokens]
         + params["pos_emb"][None, :t]).astype(jnp.bfloat16)
    mask = causal_mask(t)
    for blk in params["text_blocks"]:
        x, _ = block(blk, x, cfg.text.heads, mask=mask)
    return layernorm(params["ln_text"], x)


def _cross_kvs(params: Params, pooled: jnp.ndarray, heads: int):
    """Precompute cross-attention K/V per mm block. Blocks without an
    "xattn" sublayer (the self-attn half of a ported open_clip interleaved
    tower) get None; "ln_kv" (open_clip's ln_1_kv) is applied first."""
    from .common import layernorm, precompute_kv

    out = []
    for blk in params["mm_blocks"]:
        if "xattn" not in blk:
            out.append(None)
            continue
        src = (layernorm(blk["ln_kv"], pooled) if "ln_kv" in blk else pooled)
        out.append(precompute_kv(blk["xattn"], src, heads))
    return tuple(out)


def _mm_tower(params: Params, text_feats: jnp.ndarray, img_tokens: jnp.ndarray,
              heads: int, remat: bool = False) -> jnp.ndarray:
    t = text_feats.shape[1]
    mask = causal_mask(t)
    x = text_feats

    def blk_fn(blk, h, img):
        return block(blk, h, heads, mask=mask, cross=img)[0]

    if remat:
        blk_fn = jax.checkpoint(blk_fn)
    for blk in params["mm_blocks"]:
        x = blk_fn(blk, x, img_tokens)
    return layernorm(params["ln_mm"], x)


@functools.partial(jax.jit, static_argnames=("cfg",))
def forward(params: Params, images_u8: jnp.ndarray, tokens: jnp.ndarray,
            cfg: CaptionerConfig):
    """Training forward: returns (logits [B, T, V], image_emb [B, E],
    text_emb [B, E]) for captioning + contrastive losses."""
    PAD_ID = cfg.text.pad_id
    pooled, img_emb = encode_image(params["vision"], images_u8, cfg.vision,
                                   remat=cfg.remat)
    text_feats = _text_tower(params, tokens, cfg)
    mm = _mm_tower(params, text_feats, pooled, cfg.text.heads,
                   remat=cfg.remat)
    logits = dense(params["head"], mm)
    # text embedding: feature at the last non-pad position (CLS-by-EOS)
    lengths = jnp.sum((tokens != PAD_ID).astype(jnp.int32), axis=1) - 1
    pooled_txt = jnp.take_along_axis(
        text_feats, lengths[:, None, None].clip(0), axis=1)[:, 0]
    txt_emb = dense(params["text_proj"], pooled_txt).astype(jnp.float32)
    txt_emb = txt_emb / jnp.maximum(
        jnp.linalg.norm(txt_emb, axis=-1, keepdims=True), 1e-8)
    return logits, img_emb, txt_emb


def caption_loss(params: Params, images_u8: jnp.ndarray, tokens: jnp.ndarray,
                 cfg: CaptionerConfig, contrastive_weight: float = 1.0,
                 caption_weight: float = 2.0):
    """CoCa loss = captioning CE + CLIP-style contrastive
    (open_clip CoCa training objective)."""
    logits, img_emb, txt_emb = forward(params, images_u8, tokens, cfg)
    # next-token CE over non-pad targets
    targets = tokens[:, 1:]
    pred = logits[:, :-1]
    mask = (targets != cfg.text.pad_id).astype(jnp.float32)
    logp = jax.nn.log_softmax(pred.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    ce = jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    # contrastive
    scale = jnp.exp(params["logit_scale"])
    sim = scale * img_emb @ txt_emb.T
    n = sim.shape[0]
    labels = jnp.arange(n)
    con = 0.5 * (
        -jnp.mean(jax.nn.log_softmax(sim, axis=1)[labels, labels])
        - jnp.mean(jax.nn.log_softmax(sim, axis=0)[labels, labels]))
    return caption_weight * ce + contrastive_weight * con, {
        "caption_ce": ce, "contrastive": con}


# ---------------------------------------------------------------------------
# KV-cached generation
# ---------------------------------------------------------------------------

def _decode_step(params: Params, tok: jnp.ndarray, pos: jnp.ndarray,
                 cross_kvs, text_caches, mm_caches, cfg: CaptionerConfig):
    """One cached decoder step: tok [B] -> logits [B, V]. Cross-attention
    K/V over the (fixed) image tokens are precomputed once per generation —
    the reference re-runs the full decoder per token with no cache at all
    (ref: coca_model.py:294-327)."""
    x = (params["tok_emb"][tok][:, None, :]
         + params["pos_emb"][pos][None, None]).astype(jnp.bfloat16)
    new_tc = []
    for blk, c in zip(params["text_blocks"], text_caches):
        x, c = block(blk, x, cfg.text.heads, cache=c)
        new_tc.append(c)
    x = layernorm(params["ln_text"], x)
    new_mc = []
    for blk, c, ckv in zip(params["mm_blocks"], mm_caches, cross_kvs):
        x, c = block(blk, x, cfg.text.heads, cache=c, cross_kv=ckv)
        new_mc.append(c)
    x = layernorm(params["ln_mm"], x)
    logits = dense(params["head"], x)[:, 0]
    return logits, tuple(new_tc), tuple(new_mc)


def _sample(logits: jnp.ndarray, key, top_k: int, top_p: float,
            temperature: float) -> jnp.ndarray:
    """top-k/top-p/temperature sampling; greedy if temperature == 0
    (HF LogitsProcessor semantics, matching the reference's generate,
    ref: coca_model.py:205-333)."""
    logits = logits.astype(jnp.float32)
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1)
    logits = logits / temperature
    v = logits.shape[-1]
    if 0 < top_k < v:
        kth = jnp.sort(logits, axis=-1)[:, v - top_k][:, None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if 0.0 < top_p < 1.0:
        sorted_l = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_l, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        cutoff_idx = jnp.sum((cum < top_p).astype(jnp.int32), axis=-1)
        cutoff = jnp.take_along_axis(sorted_l, cutoff_idx[:, None], axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_len", "top_k", "top_p", "temperature",
                     "full_logits"))
def generate(params: Params, images_u8: jnp.ndarray, key, cfg: CaptionerConfig,
             max_len: Optional[int] = None, top_k: int = 0, top_p: float = 0.0,
             temperature: float = 0.0, full_logits: bool = False,
             row_valid: Optional[jnp.ndarray] = None):
    """Batched KV-cached caption generation.

    Args:
      images_u8: [B, H, W, 3] uint8 crops.
      full_logits: return the whole [B, L-1, V] per-step logits instead of
        the chosen-token log-probs. At reference vocab (49,408) the full
        tensor is ~200 KB/step/sequence of HBM->host output — opt-in for
        parity/debug only; perplexity needs just the chosen log-probs.
      row_valid: optional [B] bool; False rows start finished and emit only
        PAD (tokens [BOS, PAD...], length 1). Padded detection slots thus
        cost zero decode steps via the while_loop early exit — matching the
        reference, which only captions its real detections
        (ref: agents/goal_exploration/goal_exploration.py:77-144). Valid
        rows decode identically with or without invalid companions.

    Returns (tokens [B, L] int32 incl. BOS,
    step_logprobs [B, L-1] f32 chosen-token log-probs (or [B, L-1, V] when
    full_logits), lengths [B] int32). Finished rows emit PAD after EOS.
    """
    max_len = max_len or cfg.max_caption_len
    b = images_u8.shape[0]
    t = cfg.text
    PAD_ID, BOS_ID, EOS_ID = t.pad_id, t.bos_id, t.eos_id
    pooled, _ = encode_image(params["vision"], images_u8, cfg.vision)
    head_dim = t.width // t.heads
    tc = tuple(KVCache.create(b, max_len, t.heads, head_dim)
               for _ in range(t.layers))
    mc = tuple(KVCache.create(b, max_len, t.heads, head_dim)
               for _ in range(t.cross_layers))
    cross_kvs = _cross_kvs(params, pooled, t.heads)

    def live_step(carry, pos):
        tok, finished, tc, mc, key = carry
        logits, tc, mc = _decode_step(params, tok, pos, cross_kvs, tc, mc,
                                      cfg)
        key, sub = jax.random.split(key)
        nxt = _sample(logits, sub, top_k, top_p, temperature).astype(jnp.int32)
        was_finished = finished
        nxt = jnp.where(finished, PAD_ID, nxt)
        # a live row that SAMPLES the pad id (possible at temperature > 0
        # with the full vocab exposed) must finish too, or `tokens` grows
        # holes and lengths = sum(!= PAD) undercounts real decode steps
        finished = finished | (nxt == EOS_ID) | (~was_finished
                                                 & (nxt == PAD_ID))
        if full_logits:
            out = logits
        else:
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            out = jnp.take_along_axis(logp, nxt[:, None], axis=-1)[:, 0]
        return (nxt, finished, tc, mc, key), (nxt, out)

    tok0 = jnp.full((b,), BOS_ID, jnp.int32)
    fin0 = (jnp.zeros((b,), bool) if row_valid is None
            else ~row_valid.astype(bool))
    if full_logits:
        # parity/debug path: fixed-length scan emitting real logits at
        # every step (no early exit)
        (_, _, _, _, _), (toks, step_out) = jax.lax.scan(
            live_step, (tok0, fin0, tc, mc, key), jnp.arange(max_len - 1))
        tokens = jnp.concatenate([tok0[:, None], jnp.moveaxis(toks, 0, 1)],
                                 axis=1)
        step_out = jnp.moveaxis(step_out, 0, 1)  # [B, L-1, V]
    else:
        # all-finished EOS early exit as a while_loop: the loop stops once
        # every row emitted EOS, so real (short) captions stop paying for
        # the padded 30-token budget. A while_loop — NOT a cond-guarded
        # scan body — is essential on TPU: while carries alias in place,
        # whereas a conditional materializes copies of the KV caches on
        # every step (profiled at ~150 ms/batch, docs/BENCH.md round 3).
        # Visible outputs are unchanged: finished rows emit PAD, and the
        # pre-zeroed output buffers equal what padded steps would write.
        tokens0 = jnp.full((b, max_len), PAD_ID,
                           jnp.int32).at[:, 0].set(tok0)
        out0 = jnp.zeros((b, max_len - 1), jnp.float32)

        def cond_fn(c):
            pos, tok, finished, *_ = c
            return (pos < max_len - 1) & ~jnp.all(finished)

        def body_fn(c):
            pos, tok, finished, tc, mc, key, tokens_b, out_b = c
            (tok, finished, tc, mc, key), (nxt, out) = live_step(
                (tok, finished, tc, mc, key), pos)
            tokens_b = jax.lax.dynamic_update_slice(
                tokens_b, nxt[:, None], (0, pos + 1))
            out_b = jax.lax.dynamic_update_slice(
                out_b, out[:, None], (0, pos))
            return (pos + 1, tok, finished, tc, mc, key, tokens_b, out_b)

        (_, _, _, _, _, _, tokens, step_out) = jax.lax.while_loop(
            cond_fn, body_fn,
            (jnp.zeros((), jnp.int32), tok0, fin0, tc, mc, key, tokens0,
             out0))
    lengths = jnp.sum((tokens != PAD_ID).astype(jnp.int32), axis=1)
    return tokens, step_out, lengths


@functools.partial(jax.jit, static_argnames=("cfg", "max_len", "draft_len",
                                              "draft_layers"))
def generate_speculative(params: Params, images_u8: jnp.ndarray,
                         cfg: CaptionerConfig, max_len: Optional[int] = None,
                         draft_len: int = 4, draft_layers: int = 1):
    """Self-speculative greedy decoding (layer-skip drafting; cf. the
    SpecVLM/VVS family in PAPERS.md): a cheap draft — the text tower plus the
    first `draft_layers` multimodal blocks — proposes `draft_len` tokens,
    then ONE full-model pass verifies them all in parallel.

    Exactness: output is bit-identical to `generate` with temperature=0.
    Acceptance is batch-synchronized (min across rows), so cache entries for
    accepted positions are correct for every row, and rollback is free: the
    KV caches mask positions >= index, so rejecting tokens just rewinds the
    index. Best suited to small-batch / latency-critical serving; at large
    batch the min-acceptance collapses toward plain decoding.

    Returns (tokens [B, L], lengths [B]).
    """
    max_len = max_len or cfg.max_caption_len
    b = images_u8.shape[0]
    t = cfg.text
    PAD_ID, BOS_ID, EOS_ID = t.pad_id, t.bos_id, t.eos_id
    pooled, _ = encode_image(params["vision"], images_u8, cfg.vision)
    head_dim = t.width // t.heads
    cache_cap = max_len + draft_len + 1
    tc = tuple(KVCache.create(b, cache_cap, t.heads, head_dim)
               for _ in range(t.layers))
    mc = tuple(KVCache.create(b, cache_cap, t.heads, head_dim)
               for _ in range(t.cross_layers))
    cross_kvs = _cross_kvs(params, pooled, t.heads)

    def run(tokens_blk, pos0, tc, mc, n_mm_layers):
        """Teacher-forced pass of [B, W] tokens starting at pos0 with cache
        writes; returns (logits [B, W, V], tc, mc)."""
        w = tokens_blk.shape[1]
        pos = pos0 + jnp.arange(w)
        # bf16 stream, matching _decode_step exactly (the speculative
        # verify pass must be bit-identical to the greedy decode path)
        x = (params["tok_emb"][tokens_blk]
             + params["pos_emb"][pos][None]).astype(jnp.bfloat16)
        new_tc = []
        for blk, c in zip(params["text_blocks"], tc):
            x, c = block(blk, x, t.heads, cache=c)
            new_tc.append(c)
        x = layernorm(params["ln_text"], x)
        new_mc = []
        for i, (blk, c, ckv) in enumerate(zip(params["mm_blocks"], mc,
                                              cross_kvs)):
            if i < n_mm_layers:
                x, c = block(blk, x, t.heads, cache=c, cross_kv=ckv)
            new_mc.append(c)
        x = layernorm(params["ln_mm"], x)
        return dense(params["head"], x), tuple(new_tc), tuple(new_mc)

    # worst case (zero acceptance) advances one token per macro step; a
    # pass-through guard makes completed steps cheap no-ops
    n_macro = max_len - 1
    w = draft_len

    def macro_body(carry):
        tokens, cur_tok, pos, finished, tc, mc = carry
        # ---- draft: propose w tokens autoregressively (cheap layers) ------
        def draft_one(c, i):
            tok, dtc = c
            logits, dtc, _ = run(tok[:, None], pos + i, dtc, mc,
                                 draft_layers)
            nxt = jnp.argmax(logits[:, 0].astype(jnp.float32),
                             axis=-1).astype(jnp.int32)
            return (nxt, dtc), nxt

        (_, _), drafts = jax.lax.scan(draft_one, (cur_tok, tc),
                                      jnp.arange(w))
        drafts = jnp.moveaxis(drafts, 0, 1)  # [B, W]
        # rewind the text caches the draft advanced (index masks the rest)
        tc = tuple(KVCache(c.k, c.v, pos) for c in tc)

        # ---- verify: one full pass over [cur_tok, d0..d_{w-2}] ------------
        blk_tokens = jnp.concatenate([cur_tok[:, None], drafts[:, :-1]],
                                     axis=1)  # [B, W]
        logits, tc, mc = run(blk_tokens, pos, tc, mc, t.cross_layers)
        full_next = jnp.argmax(logits.astype(jnp.float32),
                               axis=-1).astype(jnp.int32)  # [B, W]
        # column j predicts the token at position pos+1+j
        match = (full_next == drafts) | finished[:, None]
        acc_row = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1),
                          axis=1)
        # cap acceptance at the first EOS (greedy stops there)
        eos_cap = jnp.sum(jnp.cumprod(
            (drafts != EOS_ID).astype(jnp.int32), axis=1), axis=1) + 1
        acc_row = jnp.minimum(acc_row, eos_cap)
        a = jnp.min(acc_row)                       # batch-synchronized
        a = jnp.clip(a, 0, w)

        idxs = jnp.arange(w)
        # write accepted drafts at positions pos+1 .. pos+a
        def body(i, tok):
            val = drafts[:, i]
            val = jnp.where(finished, PAD_ID, val)
            return jax.lax.cond(
                i < a,
                lambda tt: jax.lax.dynamic_update_slice(
                    tt, val[:, None], (0, pos + 1 + i)),
                lambda tt: tt, tok)

        tokens = jax.lax.fori_loop(0, w, body, tokens)
        # track EOS inside the accepted span
        finished_after = finished | jnp.any(
            jnp.where(idxs[None, :] < a, drafts == EOS_ID, False), axis=1)

        full_accept = a >= w
        # next current token: correction full_next[:, a] when a < w, else the
        # last draft (already written, not yet cached)
        corr = jnp.take_along_axis(
            full_next, jnp.clip(a, 0, w - 1)[None].repeat(b)[:, None],
            axis=1)[:, 0]
        nxt = jnp.where(full_accept, drafts[:, w - 1], corr)
        nxt = jnp.where(finished_after, PAD_ID, nxt)
        # write the correction token (only when a < w; at full acceptance the
        # loop above already wrote every position)
        tokens = jax.lax.cond(
            full_accept,
            lambda tt: tt,
            lambda tt: jax.lax.dynamic_update_slice(
                tt, nxt[:, None], (0, pos + 1 + a)), tokens)
        finished_after = finished_after | (nxt == EOS_ID)

        # cache entries are valid through the position of `nxt` - 1;
        # new pos = position of nxt = pos + a + (0 if full_accept else 1)...
        # full acceptance: nxt = d_{w-1} at position pos + w = pos + a;
        # partial: nxt = correction at position pos + a + 1.
        new_pos = pos + a + jnp.where(full_accept, 0, 1)
        tc = tuple(KVCache(c.k, c.v, new_pos) for c in tc)
        mc = tuple(KVCache(c.k, c.v, new_pos) for c in mc)
        return (tokens, nxt, new_pos, finished_after, tc, mc)

    def macro_step(carry, _):
        tokens, cur_tok, pos, finished, tc, mc = carry
        done = jnp.all(finished) | (pos >= max_len - 1)
        carry = jax.lax.cond(done, lambda c: c, macro_body, carry)
        return carry, None

    tokens0 = jnp.zeros((b, max_len + draft_len + 1),
                        jnp.int32).at[:, 0].set(BOS_ID)
    carry = (tokens0, jnp.full((b,), BOS_ID, jnp.int32),
             jnp.zeros((), jnp.int32), jnp.zeros((b,), bool), tc, mc)
    (tokens, _, _, _, _, _), _ = jax.lax.scan(macro_step, carry, None,
                                              length=n_macro)
    tokens = tokens[:, :max_len]
    lengths = jnp.sum((tokens != PAD_ID).astype(jnp.int32), axis=1)
    return tokens, lengths


@functools.partial(jax.jit, static_argnames=("cfg", "max_len", "num_beams"))
def generate_beam(params: Params, images_u8: jnp.ndarray,
                  cfg: CaptionerConfig, max_len: Optional[int] = None,
                  num_beams: int = 4, length_penalty: float = 1.0):
    """Beam-search caption generation (the reference's generate also exposes
    beam decoding via HF BeamSearchScorer, ref: coca_model.py:205-333).

    KV caches are maintained per beam (batch expanded B -> B*W) and
    re-gathered along the batch axis after each beam reshuffle. Returns
    (tokens [B, L] of the best beam, scores [B]).
    """
    max_len = max_len or cfg.max_caption_len
    w = num_beams
    b = images_u8.shape[0]
    t = cfg.text
    PAD_ID, BOS_ID, EOS_ID = t.pad_id, t.bos_id, t.eos_id
    pooled, _ = encode_image(params["vision"], images_u8, cfg.vision)
    # expand to beams: [B*W, Q, D]
    pooled = jnp.repeat(pooled, w, axis=0)
    head_dim = t.width // t.heads
    bw = b * w
    tc = tuple(KVCache.create(bw, max_len, t.heads, head_dim)
               for _ in range(t.layers))
    mc = tuple(KVCache.create(bw, max_len, t.heads, head_dim)
               for _ in range(t.cross_layers))
    cross_kvs = _cross_kvs(params, pooled, t.heads)

    neg = jnp.float32(-1e9)
    # beam 0 active, others dead at start (identical prefixes)
    beam_scores0 = jnp.tile(jnp.asarray([0.0] + [neg] * (w - 1)), (b,))

    def step(carry, pos):
        tok, finished, scores, tokens_so_far, tc, mc = carry
        logits, tc, mc = _decode_step(params, tok, pos, cross_kvs, tc, mc,
                                      cfg)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        v = logp.shape[-1]
        # finished beams only extend with PAD at no cost
        pad_only = jnp.full((bw, v), neg).at[:, PAD_ID].set(0.0)
        logp = jnp.where(finished[:, None], pad_only, logp)
        cand = scores[:, None] + logp                 # [B*W, V]
        cand = cand.reshape(b, w * v)
        top_scores, top_idx = jax.lax.top_k(cand, w)  # [B, W]
        beam_src = top_idx // v                       # which beam
        tok_next = (top_idx % v).astype(jnp.int32)
        # flatten beam indices back to [B*W]
        gather = (jnp.arange(b)[:, None] * w + beam_src).reshape(-1)
        scores = top_scores.reshape(-1)
        tok_flat = tok_next.reshape(-1)
        finished = finished[gather] | (tok_flat == EOS_ID)
        tokens_so_far = tokens_so_far[gather]
        tc = tuple(KVCache(c.k[gather], c.v[gather], c.index) for c in tc)
        mc = tuple(KVCache(c.k[gather], c.v[gather], c.index) for c in mc)
        tokens_so_far = tokens_so_far.at[:, pos + 1].set(tok_flat)
        return (tok_flat, finished, scores, tokens_so_far, tc, mc), None

    tok0 = jnp.full((bw,), BOS_ID, jnp.int32)
    fin0 = jnp.zeros((bw,), bool)
    toks0 = jnp.zeros((bw, max_len), jnp.int32).at[:, 0].set(BOS_ID)
    (_, fin, scores, tokens, _, _), _ = jax.lax.scan(
        step, (tok0, fin0, beam_scores0, toks0, tc, mc),
        jnp.arange(max_len - 1))
    lengths = jnp.sum((tokens != PAD_ID).astype(jnp.float32), axis=1)
    norm = scores / jnp.power(jnp.maximum(lengths, 1.0), length_penalty)
    norm = norm.reshape(b, w)
    best = jnp.argmax(norm, axis=1)
    tokens = tokens.reshape(b, w, max_len)[jnp.arange(b), best]
    return tokens, norm[jnp.arange(b), best]


def perplexity(step_out: jnp.ndarray, tokens: jnp.ndarray,
               pad_id: int = PAD_ID) -> jnp.ndarray:
    """exp(mean -log p(chosen)) over decode steps, per sequence
    (ref: captioner/captioning_predictor.py:34-47 computes it from the
    stepwise max-prob logits). Accepts either generate()'s default
    chosen-token log-probs [B, L-1] or full step logits [B, L-1, V].
    Pass pad_id=cfg.text.pad_id for ported-checkpoint id layouts."""
    chosen = tokens[:, 1:]
    if step_out.ndim == 3:
        logp = jax.nn.log_softmax(step_out.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, chosen[..., None], axis=-1)[..., 0]
    else:
        nll = -step_out.astype(jnp.float32)
    mask = (chosen != pad_id).astype(jnp.float32)
    mean_nll = jnp.sum(nll * mask, axis=1) / jnp.maximum(
        jnp.sum(mask, axis=1), 1.0)
    return jnp.exp(mean_nll)
