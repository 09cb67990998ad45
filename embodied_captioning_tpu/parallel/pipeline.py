"""GPipe-style pipeline parallelism over a "pipe" mesh axis.

Scales transformer block stacks across chips when a model's layers do not
fit one device (the third axis beyond DP/TP in parallel/mesh.py). TPU-first
design per the scaling-book recipe: S stages hold L/S contiguous blocks
each; M microbatches stream through a ring schedule where every step each
device applies its stage and `jax.lax.ppermute`s activations to the next
stage. XLA overlaps the ppermute with the next step's compute on ICI; the
schedule cost is the standard (S-1)/(M+S-1) bubble.

The reference has no pipeline axis at all (its largest trainable model fits
one A100 — ref: scripts/training_mpirun_coca.sh); this exists so the
framework covers models past the single-chip HBM line.

Differentiable end-to-end: ppermute/psum/scan all transpose cleanly, so the
same schedule serves the fine-tune step (autodiff yields the reversed-ring
backward pipeline).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Params = Any


def stack_stages(layer_params: Sequence[Params], stages: int) -> Params:
    """[L] list of per-layer param pytrees -> one pytree with leaves
    [S, L//S, ...] (stage-major), ready to shard P("pipe") on leaf axis 0.
    Requires L % S == 0 (homogeneous block stacks)."""
    l = len(layer_params)
    if l % stages != 0:
        raise ValueError(f"{l} layers not divisible into {stages} stages")
    per = l // stages
    groups = [
        jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs),
            *layer_params[i * per:(i + 1) * per])
        for i in range(stages)
    ]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *groups)


def shard_stacked(stacked: Params, mesh: Mesh, axis: str = "pipe") -> Params:
    """Place stacked stage params: leaf axis 0 over the pipe axis."""
    def place(leaf):
        spec = P(axis, *([None] * (leaf.ndim - 1)))
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, stacked)


def pipeline_apply(stacked: Params, x: jnp.ndarray,
                   block_fn: Callable[[Params, jnp.ndarray], jnp.ndarray],
                   mesh: Mesh, axis: str = "pipe",
                   microbatches: int = 4) -> jnp.ndarray:
    """Run a block stack distributed over `axis` on activations x [B, ...].

    block_fn(layer_params, h) -> h applies ONE block. Stages apply their
    L/S blocks in stack order, so the result equals the sequential
    composition (up to float reassociation). B % microbatches == 0.
    """
    s = mesh.shape[axis]
    b = x.shape[0]
    m = microbatches
    if b % m != 0:
        raise ValueError(f"batch {b} not divisible into {m} microbatches")
    mb = b // m
    xs = x.reshape(m, mb, *x.shape[1:])
    t_total = m + s - 1

    def device_fn(stage_params, xs_rep):
        # stage_params leaves: [1, L/S, ...] (this device's stage)
        sp = jax.tree_util.tree_map(lambda a: a[0], stage_params)
        idx = jax.lax.axis_index(axis)

        def apply_stage(h):
            def body(h, pl):
                return block_fn(pl, h), None

            h, _ = jax.lax.scan(body, h, sp)
            return h

        buf0 = jnp.zeros((m, mb) + x.shape[1:], x.dtype)
        carry0 = jnp.zeros((mb,) + x.shape[1:], x.dtype)

        def step(c, t):
            carry, buf = c
            feed = xs_rep[jnp.clip(t, 0, m - 1)]
            inp = jnp.where(idx == 0, feed, carry)
            y = apply_stage(inp)
            # the last stage banks its result at output index t-(S-1)
            oidx = jnp.clip(t - (s - 1), 0, m - 1)
            write = (idx == s - 1) & (t >= s - 1)
            cur = jax.lax.dynamic_slice_in_dim(buf, oidx, 1, axis=0)[0]
            buf = jax.lax.dynamic_update_slice_in_dim(
                buf, jnp.where(write, y, cur)[None], oidx, axis=0)
            # ring-rotate activations to the next stage
            nxt = jax.lax.ppermute(
                y, axis, [(i, (i + 1) % s) for i in range(s)])
            return (nxt, buf), None

        (_, buf), _ = jax.lax.scan(step, (carry0, buf0),
                                   jnp.arange(t_total))
        # non-last stages contributed zeros; psum replicates the result
        return jax.lax.psum(buf, axis)

    fn = jax.shard_map(
        device_fn, mesh=mesh,
        in_specs=(P(axis), P()), out_specs=P(), check_vma=False)
    out = fn(stacked, xs)
    return out.reshape(b, *x.shape[1:])


def pipeline_vit_features(params: Params, patch_tokens: jnp.ndarray,
                          cfg, mesh: Mesh, axis: str = "pipe",
                          microbatches: int = 4,
                          final_ln: bool = True,
                          stacked: Optional[Params] = None) -> jnp.ndarray:
    """models/vit.vit_features with the block stack distributed over the
    pipe axis — the integration point for encoders past single-chip HBM
    (cfg.layers % mesh.shape[axis] == 0). Embedding/pooler stay replicated
    (they are a rounding error next to the blocks). Matches vit_features
    up to float reassociation (tests/test_pipeline.py).

    Pass `stacked` = shard_stacked(stack_stages(params["blocks"], S), mesh)
    prepared ONCE at init — restacking + device_put of a multi-GB block
    stack per forward would dwarf the pipelined compute. The None default
    restacks per call (convenience/tests only)."""
    from ..models.common import block, dense, layernorm

    x = dense(params["patch"], patch_tokens)
    b = x.shape[0]
    cls = jnp.broadcast_to(params["cls"], (b, 1, cfg.width))
    x = (jnp.concatenate([cls, x], axis=1)
         + params["pos"][None]).astype(jnp.bfloat16)
    x = layernorm(params["ln_pre"], x)
    if stacked is None:
        stacked = shard_stacked(stack_stages(params["blocks"],
                                             mesh.shape[axis]), mesh, axis)
    x = pipeline_apply(
        stacked, x, lambda p, h: block(p, h, cfg.heads)[0], mesh,
        axis=axis, microbatches=microbatches)
    return layernorm(params["ln_post"], x) if final_ln else x
