"""Captioner fine-tuning: CE + contrastive + triplet, data/tensor parallel.

Replaces the reference's external fine-tune forks (ref: scripts/
training_mpirun_coca.sh drives third_parties/open_clip with
--coca-triplet-loss-weight; training_mpirun.sh drives a hf-transformers fork)
with an in-framework optax loop whose train step is one sharded jit over the
("data", "model") mesh (parallel/mesh.py): gradients all-reduce over "data",
TP layers shard over "model".

The triplet loss follows the reference's online hard mining semantics
(ref: experimenting_env/utils/triplet.py:online_mine_hard, used via
multi_stage_models.py:116-131): anchors/positives share an object id,
negatives differ; hardest positive + hardest negative per anchor.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import CaptionerConfig
from ..models.captioner import caption_loss, forward


def triplet_loss_hard(embeddings: jnp.ndarray, object_ids: jnp.ndarray,
                      valid: jnp.ndarray, margin: float = 0.2) -> jnp.ndarray:
    """Batch-hard triplet loss (ref: utils/triplet.py online_mine_hard):
    per anchor, hardest positive (same object id) and hardest negative
    (different id), hinge with margin. Embeddings are L2-normalized
    upstream; distance = squared euclidean."""
    d = jnp.sum(jnp.square(embeddings[:, None] - embeddings[None, :]),
                axis=-1)  # [N, N]
    same = (object_ids[:, None] == object_ids[None, :])
    vv = valid[:, None] & valid[None, :]
    eye = jnp.eye(d.shape[0], dtype=bool)
    pos_mask = same & vv & ~eye
    neg_mask = ~same & vv
    hardest_pos = jnp.max(jnp.where(pos_mask, d, 0.0), axis=1)
    hardest_neg = jnp.min(jnp.where(neg_mask, d, jnp.inf), axis=1)
    hardest_neg = jnp.where(jnp.isfinite(hardest_neg), hardest_neg, 0.0)
    has_trip = jnp.any(pos_mask, axis=1) & jnp.any(neg_mask, axis=1) & valid
    loss = jnp.maximum(hardest_pos - hardest_neg + margin, 0.0)
    return jnp.sum(loss * has_trip) / jnp.maximum(jnp.sum(has_trip), 1.0)


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def make_optimizer(lr: float = 1e-4, weight_decay: float = 0.01,
                   max_grad_norm: float = 1.0) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(lr, weight_decay=weight_decay),
    )


def create_train_state(params: dict, lr: float = 1e-4) -> TrainState:
    return TrainState(params, make_optimizer(lr).init(params),
                      jnp.zeros((), jnp.int32))


@functools.partial(jax.jit, static_argnames=("cfg", "lr", "triplet_weight"),
                   donate_argnums=(0,))
def train_step(state: TrainState, images_u8: jnp.ndarray,
               tokens: jnp.ndarray, object_ids: jnp.ndarray,
               sample_valid: jnp.ndarray, cfg: CaptionerConfig,
               lr: float = 1e-4, triplet_weight: float = 0.0,
               ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One fine-tune step on (crop, caption, object_id) triples. Under a
    sharded jit this is the full distributed step: batch axes sharded over
    "data", TP params over "model".

    The input state is DONATED (updated in place): without donation the
    old and new params+opt_state coexist at the update, which alone is
    ~14 GB for the ViT-L preset — the difference between fitting and
    OOMing on one 16 GB chip. Callers must not reuse the state they
    passed in (the standard `state, aux = train_step(state, ...)` idiom)."""

    def loss_fn(params):
        total, aux = caption_loss(params, images_u8, tokens, cfg)
        if triplet_weight > 0:
            _, img_emb, _ = forward(params, images_u8, tokens, cfg)
            tl = triplet_loss_hard(img_emb, object_ids, sample_valid)
            total = total + triplet_weight * tl
            aux = dict(aux, triplet=tl)
        return total, aux

    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params)
    opt = make_optimizer(lr)
    updates, opt_state = opt.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    aux = dict(aux, loss=loss)
    return TrainState(params, opt_state, state.step + 1), aux
