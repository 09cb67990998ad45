"""On-device augmentation (ops/augment.py) vs a host numpy oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from embodied_captioning_tpu.ops.augment import (
    AugmentParams, apply_augment, augment_batch, draw_augment_params,
)
from embodied_captioning_tpu.ops.detections import Detections


def _mkdet(rng, b, n, h, w):
    x1 = rng.uniform(0, w - 12, (b, n))
    y1 = rng.uniform(0, h - 12, (b, n))
    # in-canvas boxes (sim GT is always in-canvas; apply_augment clips)
    boxes = np.stack([x1, y1,
                      np.minimum(x1 + rng.uniform(6, 30, (b, n)), w),
                      np.minimum(y1 + rng.uniform(6, 30, (b, n)), h)],
                     axis=-1)
    masks = np.zeros((b, n, h, w), np.uint8)
    for i in range(b):
        for j in range(n):
            bx = boxes[i, j].astype(int)
            masks[i, j, bx[1]:bx[3], bx[0]:bx[2]] = 1
    return Detections(
        boxes=jnp.asarray(boxes, jnp.float32),
        classes=jnp.asarray(rng.integers(0, 6, (b, n)), jnp.int32),
        scores=jnp.ones((b, n), jnp.float32),
        logits=jnp.zeros((b, n, 6), jnp.float32),
        valid=jnp.asarray(rng.random((b, n)) < 0.8),
        masks=jnp.asarray(masks))


def _oracle(rgb, det, ch, cw, oy, ox, flip, bright, shift, h, w):
    """Host-side transform (selfcheck_detector.batch_of semantics)."""
    yi = oy + (np.arange(h) * ch) // h
    xi = ox + (np.arange(w) * cw) // w
    rgb = rgb[yi][:, xi]
    mk = np.asarray(det.masks)[:, yi][:, :, xi]
    bx = np.asarray(det.boxes, np.float32)
    sx, sy = w / cw, h / ch
    nb = np.stack([np.clip((bx[:, 0] - ox) * sx, 0, w),
                   np.clip((bx[:, 1] - oy) * sy, 0, h),
                   np.clip((bx[:, 2] - ox) * sx, 0, w),
                   np.clip((bx[:, 3] - oy) * sy, 0, h)], axis=1)
    keep = ((nb[:, 2] - nb[:, 0] >= 4) & (nb[:, 3] - nb[:, 1] >= 4)
            & np.asarray(det.valid))
    if flip:
        rgb = np.ascontiguousarray(rgb[:, ::-1])
        mk = np.ascontiguousarray(mk[:, :, ::-1])
        nb = np.stack([w - nb[:, 2], nb[:, 1], w - nb[:, 0], nb[:, 3]],
                      axis=1)
    rgb = np.clip(rgb.astype(np.float32) * bright + shift.reshape(1, 1, 3),
                  0, 255).astype(np.uint8)
    return rgb, nb, mk, keep


def test_matches_host_oracle():
    rng = np.random.default_rng(0)
    b, n, h, w = 3, 5, 32, 32
    rgb = rng.integers(0, 255, (b, h, w, 3), np.uint8)
    det = _mkdet(rng, b, n, h, w)
    scale = np.array([0.7, 0.55, 1.0], np.float32)
    ch = np.maximum((h * scale).astype(int), 8)
    cw = np.maximum((w * scale).astype(int), 8)
    oyf = np.array([0.3, 0.9, 0.0], np.float32)
    oxf = np.array([0.6, 0.1, 0.0], np.float32)
    oy = (oyf * (h - ch + 1)).astype(int)
    ox = (oxf * (w - cw + 1)).astype(int)
    do_crop = np.array([True, True, False])
    do_flip = np.array([False, True, True])
    bright = np.array([1.1, 0.8, 1.0], np.float32)
    shift = rng.uniform(-15, 15, (b, 3)).astype(np.float32)
    p = AugmentParams(do_crop=jnp.asarray(do_crop),
                      scale=jnp.asarray(scale), oy=jnp.asarray(oyf),
                      ox=jnp.asarray(oxf), do_flip=jnp.asarray(do_flip),
                      bright=jnp.asarray(bright), shift=jnp.asarray(shift))
    img, out = jax.jit(apply_augment)(jnp.asarray(rgb), det, p)
    for i in range(b):
        di = jax.tree_util.tree_map(lambda x: np.asarray(x)[i], det)
        cch = ch[i] if do_crop[i] else h
        ccw = cw[i] if do_crop[i] else w
        coy = oy[i] if do_crop[i] else 0
        cox = ox[i] if do_crop[i] else 0
        ergb, ebox, emask, ekeep = _oracle(
            rgb[i], di, cch, ccw, coy, cox, do_flip[i], bright[i], shift[i],
            h, w)
        np.testing.assert_array_equal(np.asarray(img)[i], ergb)
        np.testing.assert_allclose(np.asarray(out.boxes)[i], ebox,
                                   atol=1e-4)
        np.testing.assert_array_equal(np.asarray(out.masks)[i], emask)
        np.testing.assert_array_equal(np.asarray(out.valid)[i], ekeep)


def test_identity_when_disabled():
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 255, (2, 16, 16, 3), np.uint8)
    det = _mkdet(rng, 2, 3, 16, 16)
    p = draw_augment_params(jax.random.PRNGKey(0), 2, crop=False,
                            flip=False, jitter=False)
    assert not bool(p.do_crop.any()) and not bool(p.do_flip.any())
    img, out = apply_augment(jnp.asarray(rgb), det, p)
    np.testing.assert_array_equal(np.asarray(img), rgb)
    np.testing.assert_allclose(np.asarray(out.boxes), np.asarray(det.boxes),
                               atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out.valid),
                                  np.asarray(det.valid))


def test_augment_batch_jits_and_keeps_shapes():
    rng = np.random.default_rng(2)
    rgb = jnp.asarray(rng.integers(0, 255, (4, 24, 24, 3), np.uint8))
    det = _mkdet(rng, 4, 6, 24, 24)
    fn = jax.jit(lambda k: augment_batch(k, rgb, det))
    img, out = fn(jax.random.PRNGKey(3))
    assert img.shape == rgb.shape and img.dtype == jnp.uint8
    assert out.boxes.shape == det.boxes.shape
    assert out.masks.shape == det.masks.shape
    # different keys -> different draws
    img2, _ = fn(jax.random.PRNGKey(4))
    assert not np.array_equal(np.asarray(img), np.asarray(img2))
    # boxes stay inside the canvas, valid never grows
    bx = np.asarray(out.boxes)
    assert bx.min() >= 0 and bx.max() <= 24
    assert not np.any(np.asarray(out.valid) & ~np.asarray(det.valid))
