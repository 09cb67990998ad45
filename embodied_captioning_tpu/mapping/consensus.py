"""Per-voxel class-consensus strategies.

The reference resolves conflicting per-object logits inside each voxel with
one of five strategies (ref: experimenting_env/utils/inconsistencies.py:9-103
via the switch in projection_utils.py:344-351):

  seal      winner = row with globally-largest logit; class = its argmax
  bayesian  logsumexp over rows, renormalized; class = argmax
  ours      class = argmax of column-max; logits = row mean
  avg       logits = row mean; class = argmax of mean (first 6 dims)
  max       class = argmax of column-max (first 6 dims); logits = best row

The reference materializes the variable-size set of logit rows per voxel and
loops in python (solve_inconsistency). TPU-native reformulation: every
strategy above is a function of *streaming sufficient statistics* that can be
scatter-accumulated into dense per-voxel grids with static shapes:

  col_max [C]  = elementwise max over rows      (seal / ours / max)
  col_sum [C]  = elementwise sum over rows      (avg / ours)
  col_exp [C]  = sum of exp(rows)               (bayesian: logsumexp)
  n            = row count

so consensus over the whole map is a couple of vectorized argmax/`where`s on
the VPU instead of a host loop. Resolved-logits outputs differ from the
reference only for `seal`/`max` (we return the col_max vector instead of the
single achieving row — same argmax class, same downstream behavior).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

SOLUTIONS = ("seal", "bayesian", "ours", "avg", "max")


class VoxelStats(NamedTuple):
    """Streaming per-voxel logit statistics, shapes [..., C] / [...]."""

    col_max: jnp.ndarray
    col_sum: jnp.ndarray
    col_exp: jnp.ndarray
    count: jnp.ndarray

    @staticmethod
    def empty(shape, num_classes: int) -> "VoxelStats":
        return VoxelStats(
            col_max=jnp.full((*shape, num_classes), -jnp.inf, jnp.float32),
            col_sum=jnp.zeros((*shape, num_classes), jnp.float32),
            col_exp=jnp.zeros((*shape, num_classes), jnp.float32),
            count=jnp.zeros(shape, jnp.int32),
        )


def resolve(stats: VoxelStats, solution: str):
    """Resolve (class, logits) from accumulated stats. Returns
    (classes [...], logits [..., C]); classes are -1 where count == 0."""
    if solution not in SOLUTIONS:
        raise ValueError(f"unknown consensus solution {solution!r}")
    occupied = stats.count > 0
    n = jnp.maximum(stats.count, 1).astype(jnp.float32)[..., None]
    mean = stats.col_sum / n
    if solution == "seal":
        cls = jnp.argmax(stats.col_max, axis=-1)
        logits = stats.col_max
    elif solution == "bayesian":
        lse = jnp.log(jnp.maximum(stats.col_exp, 1e-30))
        norm = jnp.sum(lse, axis=-1, keepdims=True)
        logits = lse / jnp.where(jnp.abs(norm) > 1e-30, norm, 1.0)
        cls = jnp.argmax(logits, axis=-1)
    elif solution == "ours":
        cls = jnp.argmax(stats.col_max, axis=-1)
        logits = mean
    elif solution == "avg":
        logits = mean
        cls = jnp.argmax(logits, axis=-1)
    else:  # "max"
        cls = jnp.argmax(stats.col_max, axis=-1)
        logits = stats.col_max
    cls = jnp.where(occupied, cls, -1)
    logits = jnp.where(occupied[..., None], logits, 0.0)
    return cls.astype(jnp.int32), logits


def accumulate_rows(stats: VoxelStats, logits_rows: jnp.ndarray,
                    valid: jnp.ndarray) -> VoxelStats:
    """Fold a batch of logit rows [N, C] (masked by valid [N]) into a single
    voxel's stats — the dense-grid scatter versions live in voxel_map.py;
    this row-wise helper backs the object-table path and the tests."""
    v = valid[:, None]
    neg = jnp.float32(-jnp.inf)
    col_max = jnp.max(jnp.where(v, logits_rows, neg), axis=0)
    col_sum = jnp.sum(jnp.where(v, logits_rows, 0.0), axis=0)
    col_exp = jnp.sum(jnp.where(v, jnp.exp(logits_rows), 0.0), axis=0)
    n = jnp.sum(valid.astype(jnp.int32))
    return VoxelStats(
        col_max=jnp.maximum(stats.col_max, col_max),
        col_sum=stats.col_sum + col_sum,
        col_exp=stats.col_exp + col_exp,
        count=stats.count + n,
    )


def resolve_rows(logits_rows: jnp.ndarray, valid: jnp.ndarray, solution: str):
    """Reference-shaped entry: resolve a set of logit rows directly (parity
    oracle for inconsistencies.py strategies)."""
    stats = VoxelStats.empty((), logits_rows.shape[-1])
    stats = accumulate_rows(stats, logits_rows, valid)
    return resolve(stats, solution)
