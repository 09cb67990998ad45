"""Reference-scale detector code paths (bottleneck backbone, min_level,
P6 anchors, reduced-resolution mask paste) exercised at tiny dims on CPU —
the large preset itself only differs by widths/sizes (static shapes), which
`test_large_preset_shapes_compile_free` checks without compiling."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from embodied_captioning_tpu.config import DetectorConfig, load_config
from embodied_captioning_tpu.models import detector as DET
from embodied_captioning_tpu.ops.detections import Detections

# tiny bottleneck config hitting every large-preset code path
BCFG = DetectorConfig(
    image_size=64, backbone_width=8, backbone_depths=(1, 1, 1, 1),
    block="bottleneck", fpn_dim=32, min_level=1, add_p6=True,
    pre_nms_topk=64, num_proposals=16, max_detections=8, paste_size=32,
)


def test_bottleneck_forward_contract():
    params = DET.init_detector(jax.random.PRNGKey(0), BCFG)
    # R50-family shapes: stage widths 4x the mids, shortcut on stage starts
    assert params["stages"][0][0]["c3"]["w"].shape == (1, 1, 8, 32)
    assert params["stages"][3][0]["c3"]["w"].shape == (1, 1, 64, 256)
    imgs = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, (2, 64, 64, 3)).astype(np.uint8))
    det = DET.forward(params, imgs, BCFG)
    n = BCFG.max_detections
    assert det.boxes.shape == (2, n, 4)
    assert det.masks.shape == (2, n, BCFG.mask_size, BCFG.mask_size)
    b = np.asarray(det.boxes)
    assert (b >= 0).all() and (b <= BCFG.image_size).all()
    assert np.isfinite(np.asarray(det.scores)).all()


def test_fpn_levels_and_anchor_count():
    assert BCFG.fpn_strides == (8, 16, 32, 64)
    params = DET.init_detector(jax.random.PRNGKey(0), BCFG)
    imgs = jnp.zeros((1, 64, 64, 3), jnp.float32)
    fpn = DET.backbone_fpn(params, imgs, BCFG)
    assert [f.shape[1] for f in fpn] == [8, 4, 2, 1]  # strides 8..64
    anchors = DET.all_anchors(BCFG.image_size, BCFG.fpn_strides)
    assert anchors.shape == ((64 + 16 + 4 + 1) * DET.NUM_ANCHORS, 4)


def test_soft_head_preserves_confident_teacher():
    """gt.logits carries PROBABILITIES (forward stores softmaxed probs):
    at T=1 / alpha=1 a (near-)one-hot teacher must reduce the soft
    distillation to ~CE on the same targets. The old formulation softmaxed
    the probs a second time, flattening a confident teacher to near-uniform
    (roi_cls would land near -log(1/7) = 1.95 regardless of the student)."""
    params = DET.init_detector(jax.random.PRNGKey(1), BCFG)
    imgs = jnp.asarray(np.random.default_rng(1).integers(
        0, 255, (1, 64, 64, 3)).astype(np.uint8))
    cls = jnp.asarray([[1, 2, 3, 0]])
    gt = Detections(
        boxes=jnp.asarray([[[8, 8, 30, 30], [30, 30, 60, 60],
                            [5, 40, 20, 60], [0, 0, 0, 0]]], jnp.float32),
        classes=cls.astype(jnp.int32),
        scores=jnp.ones((1, 4)),
        logits=jax.nn.one_hot(cls, 6) * 0.99 + 0.01 / 6,  # confident probs
        valid=jnp.asarray([[True, True, True, False]]),
        masks=jnp.ones((1, 4, 64, 64)),
    )
    _, aux_ce = DET.detector_loss(params, imgs, gt, BCFG, head="ce")
    _, aux_soft = DET.detector_loss(params, imgs, gt, BCFG, head="soft",
                                    soft_temperature=1.0, soft_alpha=1.0)
    ce, soft = float(aux_ce["roi_cls"]), float(aux_soft["roi_cls"])
    assert abs(soft - ce) < 0.15 * max(abs(ce), 1e-3), (ce, soft)


def test_bottleneck_loss_and_grads():
    params = DET.init_detector(jax.random.PRNGKey(1), BCFG)
    imgs = jnp.asarray(np.random.default_rng(1).integers(
        0, 255, (1, 64, 64, 3)).astype(np.uint8))
    g = 4
    gt = Detections(
        boxes=jnp.asarray([[[8, 8, 30, 30], [30, 30, 60, 60],
                            [5, 40, 20, 60], [0, 0, 0, 0]]], jnp.float32),
        classes=jnp.asarray([[1, 2, 3, 0]], jnp.int32),
        scores=jnp.ones((1, g)),
        logits=jax.nn.one_hot(jnp.asarray([[1, 2, 3, 0]]), 6),
        valid=jnp.asarray([[True, True, True, False]]),
        masks=jnp.ones((1, g, 64, 64)),
    )

    def loss_fn(p):
        total, aux = DET.detector_loss(p, imgs, gt, BCFG)
        return total

    total, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(total))
    gnorm = jax.tree_util.tree_reduce(
        lambda a, x: a + (float(jnp.sum(jnp.square(x)))
                          if x is not None else 0.0),
        grads, 0.0)
    assert np.isfinite(gnorm) and gnorm > 0


def test_paste_size_scaling():
    """Masks pasted at a smaller raster land in the scaled box footprint."""
    det = Detections(
        boxes=jnp.asarray([[[16.0, 16.0, 48.0, 48.0]]]),
        classes=jnp.zeros((1, 1), jnp.int32), scores=jnp.ones((1, 1)),
        logits=jnp.ones((1, 1, 6)), valid=jnp.ones((1, 1), bool),
        masks=jnp.ones((1, 1, 4, 4)),
    )
    fm = DET.full_masks(det, 32, src_size=64)  # boxes in 64^2 space
    m = np.asarray(fm)[0, 0]
    assert m.shape == (32, 32)
    assert m[16, 16] > 0.5            # inside the (scaled) box
    assert m[2, 2] == 0 and m[30, 30] == 0  # outside


def test_perceive_sensor_to_detector_resize():
    """perceive accepts sensor-resolution frames larger than the detector
    input: detection boxes stay in detector pixel space, masks at
    paste_size, captions cropped from the original frame."""
    cfg = load_config("tiny")
    cfg = dataclasses.replace(
        cfg, detector=dataclasses.replace(cfg.detector, paste_size=32),
        sensors=dataclasses.replace(cfg.sensors, height=128, width=128))
    from embodied_captioning_tpu.perception import init_perception, perceive

    params = init_perception(jax.random.PRNGKey(0), cfg)
    imgs = jnp.asarray(np.random.default_rng(2).integers(
        0, 255, (2, 128, 128, 3)).astype(np.uint8))
    out = perceive(params, imgs, jax.random.PRNGKey(1), cfg)
    n = cfg.detector.max_detections
    assert out.detections.boxes.shape == (2, n, 4)
    assert float(jnp.max(out.detections.boxes)) <= cfg.detector.image_size
    assert out.detections.masks.shape == (2, n, 32, 32)
    assert np.isfinite(np.asarray(out.detections.embeddings)).all()


def test_fold_affine_equivalence():
    """Serving-time affine-norm folding (w' = w*g, b' = b*g + b_norm) must
    be numerically equivalent: same FPN features (up to float reassociation)
    and identical detections."""
    cfg = dataclasses.replace(BCFG, norm="affine")
    params = DET.init_detector(jax.random.PRNGKey(2), cfg)
    # give the affine params non-trivial values (init is identity)
    rng = np.random.default_rng(2)

    def jitter(p):
        if isinstance(p, dict) and set(p) == {"g", "b"}:
            return {"g": p["g"] * jnp.asarray(
                        0.5 + rng.random(p["g"].shape), jnp.float32),
                    "b": p["b"] + jnp.asarray(
                        rng.standard_normal(p["b"].shape) * 0.1, jnp.float32)}
        if isinstance(p, dict):
            return {k: jitter(v) for k, v in p.items()}
        if isinstance(p, list):
            return [jitter(v) for v in p]
        return p

    params = jitter(params)
    folded = DET.fold_affine(params, cfg)
    imgs = jnp.asarray(rng.integers(0, 255, (2, 64, 64, 3)).astype(np.uint8))
    f_a = DET.backbone_fpn(params, imgs.astype(jnp.float32) / 255.0, cfg)
    f_b = DET.backbone_fpn(folded, imgs.astype(jnp.float32) / 255.0, cfg)
    for a, b in zip(f_a, f_b):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        # folding g into w moves the bf16 weight-rounding point, so
        # features carry bf16 accumulation noise relative to feature scale
        scale = np.abs(b).max()
        assert np.abs(a - b).max() < 0.05 * scale
        assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.9999
    d_a = DET.forward(params, imgs, cfg)
    d_b = DET.forward(folded, imgs, cfg)
    assert (np.asarray(d_a.classes) == np.asarray(d_b.classes)).mean() > 0.9
    np.testing.assert_allclose(np.asarray(d_a.scores), np.asarray(d_b.scores),
                               atol=0.05)


def test_fold_affine_then_quantize():
    """Serving order is fold -> quantize (per-output-channel int8 absorbs
    the folded scale losslessly); the reverse order must fail loudly."""
    import pytest

    from embodied_captioning_tpu.models.quantize import quantize_params

    cfg = dataclasses.replace(BCFG, norm="affine")
    params = DET.init_detector(jax.random.PRNGKey(4), cfg)
    folded_q = quantize_params(DET.fold_affine(params, cfg), min_size=64)
    imgs = jnp.asarray(np.random.default_rng(4).integers(
        0, 255, (1, 64, 64, 3)).astype(np.uint8))
    det = DET.forward(folded_q, imgs, cfg)
    assert np.isfinite(np.asarray(det.scores)).all()
    with pytest.raises(ValueError):
        DET.fold_affine(folded_q, cfg)


def test_stem_s2d_exact():
    """Space-to-depth stem rewrite is bit-exact vs the strided stem conv,
    and the full forward matches under DetectorConfig.stem_s2d."""
    params = DET.init_detector(jax.random.PRNGKey(5), BCFG)
    x = jax.random.uniform(jax.random.PRNGKey(6), (2, 64, 64, 3))
    a = np.asarray(DET.conv(params["stem"], x, stride=2), np.float32)
    b = np.asarray(DET._stem_s2d(params["stem"], x), np.float32)
    np.testing.assert_array_equal(a, b)
    imgs = jnp.asarray(np.random.default_rng(5).integers(
        0, 255, (2, 64, 64, 3)).astype(np.uint8))
    d_a = DET.forward(params, imgs, BCFG)
    cfg2 = dataclasses.replace(BCFG, stem_s2d=True)
    d_b = DET.forward(params, imgs, cfg2)
    np.testing.assert_array_equal(np.asarray(d_a.boxes),
                                  np.asarray(d_b.boxes))
    np.testing.assert_array_equal(np.asarray(d_a.valid),
                                  np.asarray(d_b.valid))


def test_calibrate_affine_single_image_exact():
    """Calibrating on a single image makes the frozen affine statistics
    EQUAL GroupNorm's per-image statistics, so the affine forward must
    reproduce the GN forward on that image (by induction through the
    norm sites; bf16-stream tolerance). This pins calibrate_affine's
    site ordering AND the moment math."""
    params = DET.init_detector(jax.random.PRNGKey(7), BCFG)
    img = jnp.asarray(np.random.default_rng(7).integers(
        0, 255, (1, 64, 64, 3)).astype(np.uint8))
    cal = DET.calibrate_affine(params, [img], BCFG)
    cfg_aff = dataclasses.replace(BCFG, norm="affine")
    d_gn = DET.forward(params, img, BCFG)
    d_aff = DET.forward(cal, img, cfg_aff)
    assert (np.asarray(d_gn.valid) == np.asarray(d_aff.valid)).all()
    v = np.asarray(d_gn.valid)[0]
    if v.any():
        assert (np.asarray(d_gn.classes)[0][v]
                == np.asarray(d_aff.classes)[0][v]).all()
        np.testing.assert_allclose(np.asarray(d_gn.scores)[0][v],
                                   np.asarray(d_aff.scores)[0][v], atol=0.05)
        np.testing.assert_allclose(np.asarray(d_gn.boxes)[0][v],
                                   np.asarray(d_aff.boxes)[0][v], atol=2.0)
    # FPN features match closely (layerwise induction holds end to end)
    f_gn = DET.backbone_fpn(params, img.astype(jnp.float32) / 255.0, BCFG)
    f_aff = DET.backbone_fpn(cal, img.astype(jnp.float32) / 255.0, cfg_aff)
    for a, b in zip(f_gn, f_aff):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(np.abs(a).max(), 1e-6)
        assert np.abs(a - b).max() < 0.06 * scale
    # and the serving composition calibrate -> fold -> int8 stays sane
    from embodied_captioning_tpu.models.quantize import quantize_params

    served = quantize_params(DET.fold_affine(cal, cfg_aff), min_size=64)
    d_srv = DET.forward(served, img, cfg_aff)
    assert np.isfinite(np.asarray(d_srv.scores)).all()


def test_calibrate_affine_pooled_batches():
    """Pooled multi-batch calibration produces a usable artifact whose
    detections correlate with the GN model's on fresh images."""
    params = DET.init_detector(jax.random.PRNGKey(8), BCFG)
    rng = np.random.default_rng(8)
    batches = [jnp.asarray(rng.integers(0, 255, (2, 64, 64, 3))
                           .astype(np.uint8)) for _ in range(3)]
    cal = DET.calibrate_affine(params, batches, BCFG)
    cfg_aff = dataclasses.replace(BCFG, norm="affine")
    test_img = jnp.asarray(rng.integers(0, 255, (2, 64, 64, 3))
                           .astype(np.uint8))
    d_gn = DET.forward(params, test_img, BCFG)
    d_aff = DET.forward(cal, test_img, cfg_aff)
    assert np.isfinite(np.asarray(d_aff.scores)).all()
    # score fields live on the same scale (no blow-up from bad stats)
    assert (np.abs(np.asarray(d_aff.scores) - np.asarray(d_gn.scores)).mean()
            < 0.5)
