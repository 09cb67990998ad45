"""Device mesh + sharding helpers (the framework's distributed substrate).

Replaces the reference's torch.distributed stack — PL DDP with the vendored
long-timeout NCCL plugin (ref: experimenting_env/utils/train_helpers.py:85,
utils/ddp_long_timeout.py:86-120), habitat DDPPO `init_distrib_slurm`
(ref: agents/ppo_trainer.py:205-206), and pickled-tensor all_gather result
collection (ref: train_helpers.py:218-246) — with single-controller JAX:
one `Mesh` with ("data", "model") axes, `NamedSharding` annotations on params
and batches, and XLA-inserted collectives over ICI. Gradient all-reduce is
implicit in the sharded jit (psum over "data"); tensor-parallel layers shard
their weight matrices over "model".
"""

from __future__ import annotations

import functools
import re
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Tuple[int, ...]] = None,
              axes: Tuple[str, ...] = ("data", "model"),
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        model = 2 if n % 2 == 0 and n >= 4 else 1
        shape = (n // model, model)
    dev_arr = np.asarray(devices).reshape(shape)
    return Mesh(dev_arr, axes[: dev_arr.ndim])


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis over "data"."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


# ---------------------------------------------------------------------------
# parameter partitioning: tensor-parallel rules by param-path pattern
# ---------------------------------------------------------------------------

# Megatron-style pairs: column-parallel first matmul, row-parallel second.
# Patterns are matched against "/"-joined param paths.
TP_RULES: Sequence[Tuple[str, P]] = (
    # transformer MLP: fc column-parallel, proj row-parallel
    (r".*mlp/fc/w$", P(None, "model")),
    (r".*mlp/fc/b$", P("model")),
    (r".*mlp/proj/w$", P("model", None)),
    # attention QKV column-parallel (head dim), output row-parallel
    (r".*attn/[qkv]/w$", P(None, "model")),
    (r".*attn/[qkv]/b$", P("model")),
    (r".*attn/o/w$", P("model", None)),
    (r".*xattn/[qkv]/w$", P(None, "model")),
    (r".*xattn/[qkv]/b$", P("model")),
    (r".*xattn/o/w$", P("model", None)),
    # vocabulary head column-parallel
    (r".*head/w$", P(None, "model")),
    (r".*head/b$", P("model")),
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def partition_spec_for(path: str, leaf: jnp.ndarray,
                       tp: bool) -> P:
    if tp:
        for pat, spec in TP_RULES:
            if re.match(pat, path):
                if len(spec) <= leaf.ndim:
                    return spec
    return P()


def shard_params(params: Any, mesh: Mesh, tp: bool = True) -> Any:
    """Place a param pytree on the mesh: TP rules where they match (only if
    the axis divides), replicated otherwise."""
    model_size = mesh.shape.get("model", 1)

    def place(path, leaf):
        spec = partition_spec_for(_path_str(path), leaf, tp and model_size > 1)
        # only shard when divisible
        for i, axis in enumerate(spec):
            if axis == "model" and leaf.shape[i] % model_size != 0:
                spec = P()
                break
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    def place(leaf):
        return jax.device_put(leaf, data_sharding(mesh, leaf.ndim))

    return jax.tree_util.tree_map(place, batch)


def process_allgather(x: np.ndarray) -> np.ndarray:
    """Multi-host result collection (replaces the reference's pickled-tensor
    all_gather, ref: train_helpers.py:218-246)."""
    if jax.process_count() == 1:
        return x
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x))


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (replaces init_distrib_slurm,
    ref: ppo_trainer.py:205). No-op when single-process."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator, num_processes, process_id)
