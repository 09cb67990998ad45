"""Pipeline parallelism: GPipe ring schedule over a 'pipe' mesh axis must
reproduce the sequential block stack (forward and gradients)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from embodied_captioning_tpu.models.common import block, block_init
from embodied_captioning_tpu.parallel.pipeline import (
    pipeline_apply, shard_stacked, stack_stages,
)

HEADS = 4
DIM = 64


@pytest.fixture(scope="module")
def stack():
    ks = jax.random.split(jax.random.PRNGKey(0), 9)
    layers = [block_init(ks[i], DIM, HEADS) for i in range(8)]
    x = jax.random.normal(ks[8], (8, 6, DIM), jnp.float32)
    return layers, x


def _seq(layers, x):
    for p in layers:
        x, _ = block(p, x, HEADS, compute_dtype=jnp.float32)
    return x


def _block_fn(p, h):
    return block(p, h, HEADS, compute_dtype=jnp.float32)[0]


def _mesh(s):
    return Mesh(np.asarray(jax.devices()[:s]), ("pipe",))


@pytest.mark.parametrize("stages,microbatches", [(4, 4), (2, 8), (1, 2)])
def test_pipeline_matches_sequential(stack, stages, microbatches):
    layers, x = stack
    ref = _seq(layers, x)
    mesh = _mesh(stages)
    stacked = shard_stacked(stack_stages(layers, stages), mesh)
    out = pipeline_apply(stacked, x, _block_fn, mesh,
                         microbatches=microbatches)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_pipeline_gradients_match(stack):
    """Autodiff through the ring schedule = the backward pipeline; grads
    must match the sequential stack's."""
    layers, x = stack
    mesh = _mesh(4)
    stacked_host = stack_stages(layers, 4)
    stacked = shard_stacked(stacked_host, mesh)

    def loss_pipe(sp, x):
        return jnp.sum(jnp.square(
            pipeline_apply(sp, x, _block_fn, mesh, microbatches=4)))

    def loss_seq(ls, x):
        return jnp.sum(jnp.square(_seq(ls, x)))

    g_pipe = jax.grad(loss_pipe)(stacked, x)
    # stack the sequential grads the same stage-major way for comparison
    g_seq = stack_stages(jax.grad(loss_seq)(layers, x), 4)
    flat_p, _ = jax.tree_util.tree_flatten(g_pipe)
    flat_s, _ = jax.tree_util.tree_flatten(g_seq)
    for a, b in zip(flat_p, flat_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3)


def test_stack_stages_validates():
    layers, _ = jax.random.split(jax.random.PRNGKey(0)), None
    params = [block_init(jax.random.PRNGKey(i), DIM, HEADS)
              for i in range(6)]
    with pytest.raises(ValueError):
        stack_stages(params, 4)


def test_pipeline_vit_features_matches_sequential():
    from embodied_captioning_tpu.config import VitConfig
    from embodied_captioning_tpu.models.vit import init_vit, vit_features
    from embodied_captioning_tpu.ops.image import patchify
    from embodied_captioning_tpu.parallel.pipeline import (
        pipeline_vit_features,
    )

    cfg = VitConfig(image_size=32, patch_size=8, width=64, layers=8,
                    heads=4, pool_queries=4, pool_heads=2, embed_dim=32)
    params = init_vit(jax.random.PRNGKey(0), cfg)
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (8, 32, 32, 3))
    toks = patchify(imgs, cfg.patch_size)
    ref = vit_features(params, toks, cfg)
    out = pipeline_vit_features(params, toks, cfg, _mesh(4),
                                microbatches=4)
    a = np.asarray(out, np.float32)
    b = np.asarray(ref, np.float32)
    np.testing.assert_allclose(a, b, rtol=0.05, atol=0.05)  # bf16 stream
    assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.9999
