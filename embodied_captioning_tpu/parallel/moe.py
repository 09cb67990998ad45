"""Mixture-of-experts MLP with expert parallelism over an `expert` mesh axis.

Completes the parallelism suite (dp/tp/pp/sp/ep). The reference has no MoE
(single dense towers, ref: experimenting_env/captioner/models/coca/); this
is the serving-scale escape hatch for growing the captioner's MLP capacity
without growing per-token FLOPs, designed TPU-first:

- FIXED capacity per expert (static shapes; overflow tokens are dropped,
  the standard Switch/GShard contract) — no dynamic shapes under jit.
- Dispatch and combine are ONE-HOT MATMULS (`nec,nd->ecd` / `nec,ecd->nd`),
  not gathers — the Mesh-TensorFlow formulation that rides the MXU, and
  the same no-gather rule the rest of this repo follows (CLAUDE.md).
- Expert weights carry a leading [E, ...] axis sharded over the `expert`
  mesh axis; the dispatched [E, C, D] activations shard the same way, so
  XLA lowers the dispatch/combine contractions to all-to-alls over ICI.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.common import Params, dense_init


def moe_init(key, dim: int, hidden: int, n_experts: int) -> Params:
    ks = jax.random.split(key, 2 * n_experts + 1)
    fc = [dense_init(ks[2 * e], dim, hidden) for e in range(n_experts)]
    pr = [dense_init(ks[2 * e + 1], hidden, dim) for e in range(n_experts)]
    return {
        "gate": dense_init(ks[-1], dim, n_experts),
        "fc_w": jnp.stack([p["w"] for p in fc]),      # [E, D, H]
        "fc_b": jnp.stack([p["b"] for p in fc]),      # [E, H]
        "proj_w": jnp.stack([p["w"] for p in pr]),    # [E, H, D]
        "proj_b": jnp.stack([p["b"] for p in pr]),    # [E, D]
    }


def shard_experts(params: Params, mesh: Mesh,
                  axis: str = "expert") -> Params:
    """Place the expert-stacked leaves on the mesh, expert axis sharded."""
    def place(path, leaf):
        name = str(path[-1].key) if hasattr(path[-1], "key") else ""
        if name in ("fc_w", "fc_b", "proj_w", "proj_b"):
            spec = P(axis, *([None] * (leaf.ndim - 1)))
            return jax.device_put(leaf, NamedSharding(mesh, spec))
        return jax.device_put(leaf, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map_with_path(place, params)


def moe_mlp(p: Params, x: jnp.ndarray, capacity_factor: float = 1.25,
            top_k: int = 2, mesh: Optional[Mesh] = None,
            axis: str = "expert",
            compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Top-k gated MoE MLP. x: [B, T, D] -> [B, T, D].

    Overflow beyond each expert's capacity C = ceil(top_k * N / E * cf)
    is dropped (the token keeps only its other routes, or its residual —
    callers add the residual outside, like `models/common.block`).
    """
    b, t, d = x.shape
    n = b * t
    e = p["fc_w"].shape[0]
    cap = max(1, min(math.ceil(top_k * n / e * capacity_factor), n))
    xf = x.reshape(n, d).astype(compute_dtype)

    logits = (xf.astype(jnp.float32) @ p["gate"]["w"].astype(jnp.float32)
              + p["gate"]["b"])                       # [N, E]
    probs = jax.nn.softmax(logits, axis=-1)
    # top-k routes per token (static k loop; E is small)
    route_w = []
    route_e = []
    masked = probs
    for _ in range(top_k):
        w = jnp.max(masked, axis=-1)
        idx = jnp.argmax(masked, axis=-1)
        route_w.append(w)
        route_e.append(idx)
        masked = masked * (1.0 - jax.nn.one_hot(idx, e, dtype=probs.dtype))
    # position of each (token, route) within its expert queue, computed
    # with cumsum over the one-hot routing matrix (GShard): earlier tokens
    # win capacity slots deterministically
    disp = jnp.zeros((n, e, cap), jnp.float32)
    comb = jnp.zeros((n, e, cap), jnp.float32)
    prior = jnp.zeros((e,), jnp.float32)
    for w, idx in zip(route_w, route_e):
        onehot = jax.nn.one_hot(idx, e, dtype=jnp.float32)     # [N, E]
        pos = jnp.cumsum(onehot, axis=0) - onehot + prior      # [N, E]
        prior = prior + jnp.sum(onehot, axis=0)
        pos_id = jnp.sum(pos * onehot, axis=-1).astype(jnp.int32)  # [N]
        keep = (pos_id < cap).astype(jnp.float32)
        slot = jax.nn.one_hot(pos_id, cap, dtype=jnp.float32)      # [N, C]
        hot = onehot[:, :, None] * slot[:, None, :] * keep[:, None, None]
        disp = disp + hot
        comb = comb + hot * w[:, None, None]

    dd = disp.astype(compute_dtype)
    ex_in = jnp.einsum("nec,nd->ecd", dd, xf,
                       preferred_element_type=jnp.float32)     # [E, C, D]
    if mesh is not None:
        ex_in = jax.lax.with_sharding_constraint(
            ex_in, NamedSharding(mesh, P(axis, None, None)))
    ex_in = ex_in.astype(compute_dtype)
    h = jnp.einsum("ecd,edh->ech", ex_in,
                   p["fc_w"].astype(compute_dtype),
                   preferred_element_type=jnp.float32)
    h = jax.nn.gelu(h + p["fc_b"][:, None, :]).astype(compute_dtype)
    out_e = jnp.einsum("ech,ehd->ecd", h,
                       p["proj_w"].astype(compute_dtype),
                       preferred_element_type=jnp.float32)
    out_e = out_e + p["proj_b"][:, None, :]
    if mesh is not None:
        out_e = jax.lax.with_sharding_constraint(
            out_e, NamedSharding(mesh, P(axis, None, None)))
    out = jnp.einsum("nec,ecd->nd", comb.astype(compute_dtype),
                     out_e.astype(compute_dtype),
                     preferred_element_type=jnp.float32)
    return out.reshape(b, t, d).astype(x.dtype)


def load_balance_loss(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Switch-style auxiliary loss: E * sum_e f_e * P_e, where f_e is the
    fraction of tokens whose top-1 route is e and P_e the mean gate prob."""
    b, t, d = x.shape
    xf = x.reshape(b * t, d).astype(jnp.float32)
    logits = xf @ p["gate"]["w"].astype(jnp.float32) + p["gate"]["b"]
    probs = jax.nn.softmax(logits, axis=-1)
    e = probs.shape[-1]
    top1 = jax.nn.one_hot(jnp.argmax(probs, axis=-1), e, dtype=jnp.float32)
    return e * jnp.sum(jnp.mean(top1, 0) * jnp.mean(probs, 0))
