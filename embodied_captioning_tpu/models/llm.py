"""Small decoder-only causal LM (the in-framework LLM-consensus engine).

The reference's LD-CPS "llm" method prompts a 4-bit Llama-3-8B-Instruct
(ref: experimenting_env/captioner/pseudocaptioner.py:48-65,359-461). In this
zero-egress framework the LLM role is filled by (a) an optional local HF
checkpoint (labeling/pseudocaptioner._hf_llm_consensus) and (b) this native
JAX causal LM, which supports the consensus-by-likelihood scoring the task
actually needs: rank candidate captions by their log-likelihood under a
context of the other views ("which caption is most consistent with all
views"). It shares the framework tokenizer and is fine-tunable.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .common import (
    Params, block, block_init, causal_mask, dense, dense_init,
    embedding_init, layernorm, layernorm_init,
)
from .tokenizer import BOS_ID, EOS_ID, PAD_ID, Tokenizer, default_tokenizer


@dataclass(frozen=True)
class LMConfig:
    vocab_size: int = 1024
    width: int = 256
    layers: int = 4
    heads: int = 4
    context_length: int = 256
    mlp_ratio: float = 4.0

    @staticmethod
    def tiny() -> "LMConfig":
        return LMConfig(width=64, layers=2, heads=2, context_length=96)


def init_lm(key, cfg: LMConfig) -> Params:
    ks = iter(jax.random.split(key, cfg.layers + 3))
    return {
        "tok_emb": embedding_init(next(ks), cfg.vocab_size, cfg.width),
        "pos_emb": jax.random.normal(next(ks), (cfg.context_length,
                                                cfg.width)) * 0.02,
        "blocks": [block_init(next(ks), cfg.width, cfg.heads, cfg.mlp_ratio)
                   for _ in range(cfg.layers)],
        "ln": layernorm_init(cfg.width),
        "head": dense_init(next(ks), cfg.width, cfg.vocab_size),
    }


@functools.partial(jax.jit, static_argnames=("cfg",))
def lm_logits(params: Params, tokens: jnp.ndarray, cfg: LMConfig
              ) -> jnp.ndarray:
    t = tokens.shape[1]
    x = params["tok_emb"][tokens] + params["pos_emb"][None, :t]
    mask = causal_mask(t)
    for blk in params["blocks"]:
        x, _ = block(blk, x, cfg.heads, mask=mask, causal=True)
    return dense(params["head"], layernorm(params["ln"], x))


@functools.partial(jax.jit, static_argnames=("cfg",))
def sequence_log_prob(params: Params, tokens: jnp.ndarray, cfg: LMConfig,
                      prefix_len: jnp.ndarray) -> jnp.ndarray:
    """Mean per-token log p(tokens[prefix_len:]) — the caption-scoring
    primitive. tokens [B, T], prefix_len [B]."""
    logits = lm_logits(params, tokens, cfg)
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tgt = tokens[:, 1:]
    nll = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    pos = jnp.arange(tgt.shape[1])[None, :]
    mask = ((tgt != PAD_ID) & (pos >= (prefix_len[:, None] - 1))).astype(
        jnp.float32)
    return jnp.sum(nll * mask, axis=1) / jnp.maximum(jnp.sum(mask, axis=1),
                                                     1.0)


def lm_loss(params: Params, tokens: jnp.ndarray, cfg: LMConfig):
    logits = lm_logits(params, tokens, cfg)
    tgt = tokens[:, 1:]
    mask = (tgt != PAD_ID).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


class ConsensusLM:
    """Caption consensus by contextual likelihood: score each candidate by
    its likelihood given the other views as context."""

    def __init__(self, cfg: Optional[LMConfig] = None, seed: int = 0,
                 params: Optional[Params] = None,
                 tokenizer: Optional[Tokenizer] = None):
        self.cfg = cfg or LMConfig.tiny()
        self.params = params or init_lm(jax.random.PRNGKey(seed), self.cfg)
        self.tokenizer = tokenizer or default_tokenizer(self.cfg.vocab_size)

    def choose(self, captions: Sequence[str]) -> str:
        if len(captions) == 1:
            return captions[0]
        t = self.cfg.context_length
        rows = []
        prefix_lens = []
        for i, cand in enumerate(captions):
            context = " . ".join(c for j, c in enumerate(captions) if j != i)
            ctx_ids = self.tokenizer.encode(context, bos=True, eos=False)
            cand_ids = self.tokenizer.encode(cand, bos=False, eos=True)
            ids = (ctx_ids + cand_ids)[:t]
            prefix_lens.append(min(len(ctx_ids), t - 1))
            rows.append(ids + [PAD_ID] * (t - len(ids)))
        scores = sequence_log_prob(
            self.params, jnp.asarray(np.asarray(rows, np.int32)), self.cfg,
            jnp.asarray(prefix_lens, jnp.int32))
        return captions[int(np.argmax(np.asarray(scores)))]
