"""Pairwise-cosine disagreement kernels.

The disagreement score of an object is the mean pairwise cosine *distance*
over its multi-view caption embeddings, including the zero diagonal
(ref: experimenting_env/utils/projection_utils.py:928-942 _cosine_distance:
``(1 - (mat.T @ mat) / norm / norm.T).mean()`` over a [D, K] matrix).

TPU-native form: embeddings live in fixed-capacity per-object buffers
[M, K, D] with per-object counts; the whole object table is scored in one
batched matmul on the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cosine_disagreement(embeddings: jnp.ndarray, count: jnp.ndarray,
                        eps: float = 1e-8) -> jnp.ndarray:
    """Mean pairwise cosine distance per object.

    Args:
      embeddings: [M, K, D] per-object view-embedding buffers (rows >= count
        are ignored).
      count: [M] int32 number of valid views per object.

    Returns [M] float32; exactly 0 for objects with < 2 views (the reference
    returns 0 for a single embedding, ref: projection_utils.py:936-937).
    """
    m, k, d = embeddings.shape
    cnt = count.astype(jnp.float32)
    row_mask = (jnp.arange(k)[None, :] < count[:, None])  # [M, K]
    e = jnp.where(row_mask[..., None], embeddings, 0.0).astype(jnp.float32)
    norms = jnp.sqrt(jnp.sum(e * e, axis=-1))  # [M, K]
    safe = jnp.maximum(norms, eps)
    gram = jnp.einsum("mkd,mld->mkl", e, e,
                      preferred_element_type=jnp.float32)
    cos = gram / (safe[:, :, None] * safe[:, None, :])
    pair_mask = row_mask[:, :, None] & row_mask[:, None, :]
    dist = jnp.where(pair_mask, 1.0 - cos, 0.0)
    denom = jnp.maximum(cnt * cnt, 1.0)
    out = jnp.sum(dist, axis=(1, 2)) / denom
    return jnp.where(count >= 2, out, 0.0)


def cosine_similarity_matrix(a: jnp.ndarray, b: jnp.ndarray,
                             eps: float = 1e-8) -> jnp.ndarray:
    """[N, D] x [M, D] -> [N, M] cosine similarities (SBERT-style scoring,
    ref: scripts/compute_cosine_sim.py:11-22)."""
    an = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), eps)
    bn = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), eps)
    return an @ bn.T


def mean_pairwise_cosine_distance(embs: jnp.ndarray, valid: jnp.ndarray,
                                  ) -> jnp.ndarray:
    """Scalar mean pairwise cosine distance over one set [K, D] with validity
    mask — single-object version of :func:`cosine_disagreement`."""
    return cosine_disagreement(embs[None], jnp.sum(valid.astype(jnp.int32))[None])[0]
