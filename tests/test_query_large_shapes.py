"""Compile-free shape regression for the query family at serving scale.

`jax.eval_shape` traces the full query detector at the large preset's
operating point (1024² input, R50-class bottleneck backbone) without
paying the compile — the same guard style as the preset checks in
test_matching_extras.py."""

import dataclasses

import jax
import jax.numpy as jnp

from embodied_captioning_tpu.config import load_config
from embodied_captioning_tpu.models import detector as DET


def test_query_family_shapes_at_reference_scale():
    cfg = load_config("large").detector
    qcfg = dataclasses.replace(cfg, family="query", norm="gn",
                               approx_topk=False)
    assert qcfg.image_size >= 1024 and qcfg.block == "bottleneck"

    params_shape = jax.eval_shape(
        lambda k: DET.init_detector(k, qcfg), jax.random.PRNGKey(0))
    assert "query_embed" in params_shape and "rpn_conv" not in params_shape
    assert params_shape["query_embed"].shape == (qcfg.num_queries,
                                                 qcfg.fpn_dim)
    assert len(params_shape["layers"]) == qcfg.query_layers

    e, s = 2, qcfg.image_size
    out = jax.eval_shape(
        lambda p, im: DET.forward(p, im, qcfg),
        params_shape, jax.ShapeDtypeStruct((e, s, s, 3), jnp.uint8))
    n = qcfg.max_detections
    assert out.boxes.shape == (e, n, 4)
    assert out.masks.shape == (e, n, qcfg.mask_size, qcfg.mask_size)
    assert out.logits.shape == (e, n, qcfg.num_classes)

    # the set loss traces at scale too (Hungarian matching included)
    gt_shapes = type(out)(
        boxes=jax.ShapeDtypeStruct((e, n, 4), jnp.float32),
        classes=jax.ShapeDtypeStruct((e, n), jnp.int32),
        scores=jax.ShapeDtypeStruct((e, n), jnp.float32),
        logits=jax.ShapeDtypeStruct((e, n, qcfg.num_classes), jnp.float32),
        valid=jax.ShapeDtypeStruct((e, n), bool),
        masks=jax.ShapeDtypeStruct((e, n, s, s), jnp.uint8))
    loss, aux = jax.eval_shape(
        lambda p, im, g: DET.detector_loss(p, im, g, qcfg),
        params_shape, jax.ShapeDtypeStruct((e, s, s, 3), jnp.uint8),
        gt_shapes)
    assert loss.shape == ()


def test_query_family_inside_fused_perception():
    """The fused perception program dispatches to the query head when the
    config says so (detector -> crops -> captioner -> sbert all trace)."""
    from embodied_captioning_tpu.perception import init_perception, perceive

    cfg = load_config("tiny", overrides=[
        "detector.family=query", "detector.fpn_dim=64",
        "detector.num_queries=16", "detector.query_layers=2"])
    params_shape = jax.eval_shape(
        lambda k: init_perception(k, cfg), jax.random.PRNGKey(0))
    assert "query_embed" in params_shape.detector
    e, s = 2, cfg.sensors.height
    out = jax.eval_shape(
        lambda p, im, k: perceive(p, im, k, cfg), params_shape,
        jax.ShapeDtypeStruct((e, s, s, 3), jnp.uint8),
        jax.ShapeDtypeStruct((2,), jnp.uint32))
    n = cfg.detector.max_detections
    assert out.detections.boxes.shape == (e, n, 4)
    assert out.detections.embeddings.shape == (e, n, 384)
