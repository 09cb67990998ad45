"""Mixture-of-experts MLP with expert parallelism over an `expert` mesh axis.

Completes the parallelism suite (dp/tp/pp/sp/ep). The reference has no MoE
(single dense towers, ref: experimenting_env/captioner/models/coca/); this
is the serving-scale escape hatch for growing the captioner's MLP capacity
without growing per-token FLOPs, designed TPU-first:

- FIXED capacity per expert (static shapes; overflow tokens are dropped,
  the standard Switch/GShard contract) — no dynamic shapes under jit.
- Tokens are routed in GROUPS (GShard's group axis): capacity and the
  dispatch one-hots are per-group, so dispatch memory is
  O(N * group_size * top_k * cf) — linear in token count — instead of the
  O(N^2) a single flat group would cost.
- Dispatch and combine are ONE-HOT MATMULS (`nec,nd->ecd` / `nec,ecd->nd`),
  not gathers — the Mesh-TensorFlow formulation that rides the MXU, and
  the same no-gather rule the rest of this repo follows (CLAUDE.md).
- Expert weights carry a leading [E, ...] axis sharded over the `expert`
  mesh axis; the dispatched [G, E, C, D] activations shard the same way,
  so XLA lowers the dispatch/combine contractions to all-to-alls over ICI.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

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


def _route_group(probs: jnp.ndarray, top_k: int,
                 cap: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One group's routing: probs [Ng, E] (already zeroed for pad tokens)
    -> (dispatch [Ng, E, C] 0/1, combine [Ng, E, C] gate-weighted).
    Capacity slots go to earlier tokens deterministically (GShard cumsum);
    route r+1 queues after all of route r."""
    ng, e = probs.shape
    disp = jnp.zeros((ng, e, cap), jnp.float32)
    comb = jnp.zeros((ng, e, cap), jnp.float32)
    prior = jnp.zeros((e,), jnp.float32)
    masked = probs
    for _ in range(top_k):
        w = jnp.max(masked, axis=-1)
        idx = jnp.argmax(masked, axis=-1)
        onehot = (jax.nn.one_hot(idx, e, dtype=jnp.float32)
                  * (w > 0.0)[:, None])  # pad tokens (all-zero probs) route nowhere
        masked = masked * (1.0 - onehot)
        pos = jnp.cumsum(onehot, axis=0) - onehot + prior      # [Ng, E]
        prior = prior + jnp.sum(onehot, axis=0)
        pos_id = jnp.sum(pos * onehot, axis=-1).astype(jnp.int32)
        keep = jnp.sum(onehot, -1) * (pos_id < cap)
        slot = jax.nn.one_hot(pos_id, cap, dtype=jnp.float32)  # [Ng, C]
        hot = onehot[:, :, None] * slot[:, None, :] * keep[:, None, None]
        disp = disp + hot
        comb = comb + hot * w[:, None, None]
    return disp, comb


def moe_mlp(p: Params, x: jnp.ndarray, capacity_factor: float = 1.25,
            top_k: int = 2, mesh: Optional[Mesh] = None,
            axis: str = "expert", group_size: int = 1024,
            compute_dtype=jnp.bfloat16,
            return_gate_probs: bool = False):
    """Top-k gated MoE MLP. x: [B, T, D] -> [B, T, D].

    Tokens are split into groups of `group_size`; each group gets expert
    capacity C = ceil(top_k * Ng / E * cf). Overflow beyond C is dropped
    (the token keeps only its other routes, or its residual — callers add
    the residual outside, like `models/common.block`).

    `return_gate_probs=True` additionally returns the [N, E] gate softmax
    (pre-pad-masking) so `load_balance_loss` reuses this forward's routing
    distribution instead of recomputing the gate.
    """
    b, t, d = x.shape
    n = b * t
    e = p["fc_w"].shape[0]
    if top_k > e:
        raise ValueError(f"top_k={top_k} exceeds expert count {e}")
    ng = min(group_size, n)
    g = math.ceil(n / ng)
    n_pad = g * ng
    cap = max(1, min(math.ceil(top_k * ng / e * capacity_factor), ng))
    xf = x.reshape(n, d).astype(compute_dtype)

    logits = (xf.astype(jnp.float32) @ p["gate"]["w"].astype(jnp.float32)
              + p["gate"]["b"])                       # [N, E]
    probs = jax.nn.softmax(logits, axis=-1)
    xp = jnp.pad(xf, ((0, n_pad - n), (0, 0)))
    pp = jnp.pad(probs, ((0, n_pad - n), (0, 0)))     # pad rows all-zero
    disp, comb = jax.vmap(lambda q: _route_group(q, top_k, cap))(
        pp.reshape(g, ng, e))                         # [G, Ng, E, C]

    dd = disp.astype(compute_dtype)
    ex_in = jnp.einsum("gnec,gnd->gecd", dd, xp.reshape(g, ng, d),
                       preferred_element_type=jnp.float32)  # [G, E, C, D]
    if mesh is not None:
        ex_in = jax.lax.with_sharding_constraint(
            ex_in, NamedSharding(mesh, P(None, axis, None, None)))
    # XLA:CPU's DotThunk cannot run bf16 x bf16 -> f32 for the e-batched
    # expert matmuls (TPU MXU can, natively); upcast on CPU only — the
    # branch is trace-time static, nothing leaks into the TPU program.
    # "axon" is the tunneled-TPU backend (same acceptance as common.py
    # _ln_kernel_ok) — it must keep the bf16 path.
    mm_dtype = (jnp.float32
                if jax.default_backend() not in ("tpu", "axon")
                else compute_dtype)
    ex_in = ex_in.astype(mm_dtype)
    h = jnp.einsum("gecd,edh->gech", ex_in,
                   p["fc_w"].astype(mm_dtype),
                   preferred_element_type=jnp.float32)
    h = jax.nn.gelu(h + p["fc_b"][None, :, None, :]).astype(mm_dtype)
    out_e = jnp.einsum("gech,ehd->gecd", h,
                       p["proj_w"].astype(mm_dtype),
                       preferred_element_type=jnp.float32)
    out_e = out_e + p["proj_b"][None, :, None, :]
    if mesh is not None:
        out_e = jax.lax.with_sharding_constraint(
            out_e, NamedSharding(mesh, P(None, axis, None, None)))
    out = jnp.einsum("gnec,gecd->gnd", comb.astype(compute_dtype),
                     out_e.astype(compute_dtype),
                     preferred_element_type=jnp.float32)
    out = out.reshape(n_pad, d)[:n].reshape(b, t, d).astype(x.dtype)
    return (out, probs) if return_gate_probs else out


def load_balance_loss(p: Params, x: jnp.ndarray,
                      gate_probs: Optional[jnp.ndarray] = None
                      ) -> jnp.ndarray:
    """Switch-style auxiliary loss: E * sum_e f_e * P_e, where f_e is the
    fraction of tokens whose top-1 route is e and P_e the mean gate prob.
    Pass `gate_probs` from `moe_mlp(..., return_gate_probs=True)` to avoid
    recomputing the gate forward (and to guarantee the loss sees the exact
    routing distribution the layer used)."""
    if gate_probs is None:
        b, t, d = x.shape
        xf = x.reshape(b * t, d).astype(jnp.float32)
        logits = xf @ p["gate"]["w"].astype(jnp.float32) + p["gate"]["b"]
        gate_probs = jax.nn.softmax(logits, axis=-1)
    e = gate_probs.shape[-1]
    top1 = jax.nn.one_hot(jnp.argmax(gate_probs, axis=-1), e,
                          dtype=jnp.float32)
    return e * jnp.sum(jnp.mean(top1, 0) * jnp.mean(gate_probs, 0))
