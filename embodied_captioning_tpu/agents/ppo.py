"""PPO: clipped surrogate + clipped value loss, jit'd update (optax).

Parity with the reference's PPO (ref: experimenting_env/agents/ppo.py:10-110,
the ikostrikov implementation): ratio clip, value clip, entropy bonus, grad
norm clipping, epochs x minibatches. Here the whole update — GAE, minibatch
slicing, epochs — runs inside one jit on device; minibatch order is driven by
a PRNG key so the update is deterministic given (params, rollout, key).
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import PPOConfig
from .policy import evaluate_actions
from .storage import Rollout, compute_gae


class PPOState(NamedTuple):
    params: dict
    opt_state: optax.OptState


def make_optimizer(cfg: PPOConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adam(cfg.lr, eps=cfg.eps),
    )


def create_state(params: dict, cfg: PPOConfig) -> PPOState:
    return PPOState(params, make_optimizer(cfg).init(params))


@functools.partial(jax.jit, static_argnames=("cfg", "categorical"))
def ppo_update(state: PPOState, rollout: Rollout, key,
               cfg: PPOConfig, categorical: bool = False
               ) -> Tuple[PPOState, Dict[str, jnp.ndarray]]:
    """One full PPO update (ppo_epoch x num_mini_batch) over a rollout."""
    t_len, e = rollout.rewards.shape
    returns, advantages = compute_gae(
        jnp.asarray(rollout.rewards), jnp.asarray(rollout.values),
        jnp.asarray(rollout.masks), cfg.gamma, cfg.tau)
    adv = (advantages - advantages.mean()) / (advantages.std() + 1e-5)

    # flatten time x env
    n = t_len * e

    def flat(x):
        return jnp.asarray(x[:t_len]).reshape(n, *x.shape[2:])

    maps = flat(rollout.maps)
    orient = flat(rollout.orientation)
    actions = flat(rollout.raw_actions)
    old_lp = flat(rollout.log_probs)
    old_v = jnp.asarray(rollout.values[:t_len]).reshape(n)
    ret = returns.reshape(n)
    adv_f = adv.reshape(n)
    rnn = (None if rollout.rnn_states is None
           else jnp.asarray(rollout.rnn_states).reshape(
               n, rollout.rnn_states.shape[-1]))

    opt = make_optimizer(cfg)
    mb = n // cfg.num_mini_batch

    def loss_fn(params, idx):
        lp, ent, v = evaluate_actions(
            params, maps[idx], orient[idx], actions[idx], categorical,
            rnn_state=None if rnn is None else rnn[idx])
        ratio = jnp.exp(lp - old_lp[idx])
        s1 = ratio * adv_f[idx]
        s2 = jnp.clip(ratio, 1 - cfg.clip_param, 1 + cfg.clip_param) * adv_f[idx]
        action_loss = -jnp.mean(jnp.minimum(s1, s2))
        v_clip = old_v[idx] + jnp.clip(v - old_v[idx], -cfg.clip_param,
                                       cfg.clip_param)
        vl = jnp.square(v - ret[idx])
        vl_clip = jnp.square(v_clip - ret[idx])
        value_loss = 0.5 * jnp.mean(jnp.maximum(vl, vl_clip))
        total = (action_loss + cfg.value_loss_coef * value_loss
                 - cfg.entropy_coef * ent)
        return total, (action_loss, value_loss, ent)

    def epoch_body(carry, ekey):
        state = carry
        perm = jax.random.permutation(ekey, n)

        def mb_body(state, m):
            idx = jax.lax.dynamic_slice_in_dim(perm, m * mb, mb)
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, idx)
            updates, opt_state = opt.update(grads, state.opt_state,
                                            state.params)
            params = optax.apply_updates(state.params, updates)
            return PPOState(params, opt_state), (loss, *aux)

        state, metrics = jax.lax.scan(mb_body, state,
                                      jnp.arange(cfg.num_mini_batch))
        return state, metrics

    keys = jax.random.split(key, cfg.ppo_epoch)
    state, metrics = jax.lax.scan(epoch_body, state, keys)
    loss, al, vl, ent = [m.mean() for m in metrics]
    return state, {"loss": loss, "action_loss": al, "value_loss": vl,
                   "entropy": ent}
