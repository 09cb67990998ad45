"""Global exploration policy network + action distributions (JAX).

Parity with the reference's Global_Policy / RL_Policy (ref: experimenting_env/
agents/model.py:18-154): 5-conv CNN over the 2x128x128 policy maps
(disagreement map + topdown map with the agent disc), a 72-way orientation
embedding, 512->256 FC trunk, value head and a distribution head —
DiagGaussian over (x, y) in [0,1]^2 map goals (the goal-exploration action
space) or Categorical for discrete variants
(ref: utils/distributions.py:38-62).
"""

from __future__ import annotations

import math
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import PolicyConfig
from ..models.common import Params, dense, dense_init
from ..models.detector import conv, conv_init


class PolicyOutput(NamedTuple):
    value: jnp.ndarray        # [B]
    mean: jnp.ndarray         # [B, A] (gaussian mean or categorical logits)
    log_std: jnp.ndarray      # [A] (gaussian only)
    rnn_state: Optional[jnp.ndarray] = None  # [B, 256] updated GRU state


def init_policy(key, cfg: PolicyConfig, num_actions: int = 2) -> Params:
    ks = iter(jax.random.split(key, 16))
    chans = [cfg.input_channels, 32, 64, 128, 64, 32]
    convs = [conv_init(next(ks), 3, chans[i], chans[i + 1])
             for i in range(5)]
    # 5 stride-2 SAME convs: ceil division per layer (a plain //32 is only
    # right when map_size is a multiple of 32 and otherwise builds fc1
    # with the wrong input dim)
    feat_side = cfg.map_size
    for _ in range(5):
        feat_side = -(-feat_side // 2)
    flat = 32 * feat_side * feat_side
    extra = {"gru": init_gru(next(ks), 256)} if cfg.recurrent else {}
    return extra | {
        "convs": convs,
        "orient_emb": jax.random.normal(next(ks),
                                        (cfg.orientation_bins, 8)) * 0.02,
        "fc1": dense_init(next(ks), flat + 8, 512),
        "fc2": dense_init(next(ks), 512, 256),
        "value": dense_init(next(ks), 256, 1, scale=0.01),
        "act": dense_init(next(ks), 256, num_actions, scale=0.01),
        "log_std": jnp.full((num_actions,), -1.0),
    }


def init_gru(key, dim: int) -> Params:
    """GRU cell (the reference's recurrent NNBase,
    ref: utils/model.py:83-135)."""
    k1, k2 = jax.random.split(key)
    return {
        "wx": dense_init(k1, dim, 3 * dim),
        "wh": dense_init(k2, dim, 3 * dim),
    }


def gru_step(p: Params, h: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    gx = dense(p["wx"], x)
    gh = dense(p["wh"], h)
    d = h.shape[-1]
    r = jax.nn.sigmoid(gx[..., :d] + gh[..., :d])
    z = jax.nn.sigmoid(gx[..., d:2 * d] + gh[..., d:2 * d])
    n = jnp.tanh(gx[..., 2 * d:] + r * gh[..., 2 * d:])
    return (1 - z) * n + z * h


def policy_forward(params: Params, maps: jnp.ndarray,
                   orientation: jnp.ndarray,
                   rnn_state: Optional[jnp.ndarray] = None) -> PolicyOutput:
    """maps [B, H, W, C] float, orientation [B] int32 bin index. If the
    policy was initialized recurrent and `rnn_state` [B, 256] is given, a
    GRU refines the trunk features (ref: agents/model.py + NNBase GRU)."""
    x = maps
    for cv in params["convs"]:
        x = jax.nn.relu(conv(cv, x, stride=2))
    b = x.shape[0]
    x = x.reshape(b, -1)
    o = params["orient_emb"][orientation]
    x = jnp.concatenate([x, o], axis=-1)
    x = jax.nn.relu(dense(params["fc1"], x))
    x = jax.nn.relu(dense(params["fc2"], x))
    h = None
    if rnn_state is not None and "gru" in params:
        x = h = gru_step(params["gru"], rnn_state, x)
    value = dense(params["value"], x)[:, 0]
    mean = dense(params["act"], x)
    return PolicyOutput(value, mean, params["log_std"], h)


# ---------------------------------------------------------------------------
# distributions
# ---------------------------------------------------------------------------


def gaussian_sample(key, mean: jnp.ndarray, log_std: jnp.ndarray
                    ) -> jnp.ndarray:
    return mean + jnp.exp(log_std) * jax.random.normal(key, mean.shape)


def gaussian_log_prob(action: jnp.ndarray, mean: jnp.ndarray,
                      log_std: jnp.ndarray) -> jnp.ndarray:
    var = jnp.exp(2 * log_std)
    lp = -0.5 * (jnp.square(action - mean) / var
                 + 2 * log_std + math.log(2 * math.pi))
    return jnp.sum(lp, axis=-1)


def gaussian_entropy(log_std: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(log_std + 0.5 * math.log(2 * math.pi * math.e))


def categorical_sample(key, logits: jnp.ndarray) -> jnp.ndarray:
    return jax.random.categorical(key, logits, axis=-1)


def categorical_log_prob(action: jnp.ndarray, logits: jnp.ndarray
                         ) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.take_along_axis(logp, action[..., None].astype(jnp.int32),
                               axis=-1)[..., 0]


def categorical_entropy(logits: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(jnp.exp(logp) * logp, axis=-1))


def act(params: Params, key, maps: jnp.ndarray, orientation: jnp.ndarray,
        deterministic: bool = False, categorical: bool = False,
        rnn_state: Optional[jnp.ndarray] = None):
    """Sample an action; returns (action, raw_action, log_prob, value) — or,
    when `rnn_state` is given (recurrent policy, ref: utils/model.py NNBase),
    (action, raw_action, log_prob, value, new_rnn_state).
    Box actions are squashed to [0,1]^2 with sigmoid (map-goal convention,
    ref: goal_exploration.py samples a (x, y) in [0,1]^2); `raw_action` is
    the pre-squash sample stored for PPO evaluation."""
    out = policy_forward(params, maps, orientation, rnn_state)
    if categorical:
        a = (jnp.argmax(out.mean, -1) if deterministic
             else categorical_sample(key, out.mean))
        lp = categorical_log_prob(a, out.mean)
        res = (a, a, lp, out.value)
    else:
        raw = out.mean if deterministic else gaussian_sample(key, out.mean,
                                                             out.log_std)
        lp = gaussian_log_prob(raw, out.mean, out.log_std)
        res = (jax.nn.sigmoid(raw), raw, lp, out.value)
    return res + (out.rnn_state,) if rnn_state is not None else res


def evaluate_actions(params: Params, maps: jnp.ndarray,
                     orientation: jnp.ndarray, raw_actions: jnp.ndarray,
                     categorical: bool = False,
                     rnn_state: Optional[jnp.ndarray] = None):
    """(log_probs, entropy, values) for PPO updates. `raw_actions` are the
    pre-squash samples stored at rollout time; `rnn_state` (if recurrent)
    the GRU states stored alongside them."""
    out = policy_forward(params, maps, orientation, rnn_state)
    if categorical:
        lp = categorical_log_prob(raw_actions, out.mean)
        ent = categorical_entropy(out.mean)
    else:
        lp = gaussian_log_prob(raw_actions, out.mean, out.log_std)
        ent = gaussian_entropy(out.log_std)
    return lp, ent, out.value
