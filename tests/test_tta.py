"""Flip test-time augmentation (models/detector.flip_detections/forward_tta).

Key property: forward_tta is flip-EQUIVARIANT by construction — its merged
candidate set for a mirrored frame is exactly the mirror of the candidate
set for the original frame (fwd(I) ∪ flip(fwd(flip I)) vs
fwd(flip I) ∪ flip(fwd(I))), so NMS survives identically and the outputs
mirror each other, even though a raw CNN forward is NOT flip-equivariant.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from embodied_captioning_tpu.config import DetectorConfig
from embodied_captioning_tpu.models import detector as DET
from embodied_captioning_tpu.ops.detections import Detections

CFG = dataclasses.replace(DetectorConfig.tiny(), score_threshold=0.01)


def _frame(rng, size):
    img = rng.integers(0, 255, (2, size, size, 3)).astype(np.uint8)
    # drop in a couple of solid blocks so the random detector has structure
    img[:, 10:30, 8:24] = (200, 40, 40)
    img[:, 34:54, 40:60] = (40, 200, 40)
    return jnp.asarray(img)


def test_flip_detections_involution_and_math():
    size = 64.0
    det = Detections(
        boxes=jnp.asarray([[[4.0, 6.0, 20.0, 30.0], [0.0, 0.0, 0.0, 0.0]]]),
        classes=jnp.asarray([[2, 0]], jnp.int32),
        scores=jnp.asarray([[0.9, 0.0]]),
        logits=jnp.zeros((1, 2, 6)),
        valid=jnp.asarray([[True, False]]),
        masks=jnp.asarray(np.arange(1 * 2 * 4 * 4, dtype=np.float32)
                          .reshape(1, 2, 4, 4)),
    )
    f = DET.flip_detections(det, size)
    np.testing.assert_allclose(np.asarray(f.boxes[0, 0]),
                               [size - 20.0, 6.0, size - 4.0, 30.0])
    # invalid slot stays zeroed
    np.testing.assert_array_equal(np.asarray(f.boxes[0, 1]), 0.0)
    # mask crops mirror along their own x axis
    np.testing.assert_array_equal(np.asarray(f.masks),
                                  np.asarray(det.masks)[..., ::-1])
    ff = DET.flip_detections(f, size)
    np.testing.assert_allclose(np.asarray(ff.boxes[0, 0]),
                               np.asarray(det.boxes[0, 0]), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ff.masks), np.asarray(det.masks))


def test_forward_tta_contract_and_flip_equivariance():
    params = DET.init_detector(jax.random.PRNGKey(0), CFG)
    imgs = _frame(np.random.default_rng(0), CFG.image_size)

    det = DET.forward_tta(params, imgs, CFG)
    n = CFG.max_detections
    assert det.boxes.shape == (2, n, 4)
    assert det.masks.shape == (2, n, CFG.mask_size, CFG.mask_size)
    bx = np.asarray(det.boxes)
    assert bx.min() >= 0 and bx.max() <= CFG.image_size
    v = np.asarray(det.valid)
    assert v.any(), "random tiny detector should fire at threshold 0.01"
    # survivors are score-sorted (argmax-NMS order)
    sc = np.asarray(det.scores)
    for b in range(2):
        s = sc[b][v[b]]
        assert (np.diff(s) <= 1e-6).all()

    det_m = DET.forward_tta(params, imgs[:, :, ::-1, :], CFG)
    back = DET.flip_detections(det_m, float(CFG.image_size))
    np.testing.assert_array_equal(np.asarray(det.valid),
                                  np.asarray(back.valid))
    # boxes are computed in bf16 (spacing 2^-8 * magnitude): the same
    # coordinate decoded from the mirrored frame rounds at a different
    # magnitude (x vs size-x), so equivariance holds to bf16 resolution
    np.testing.assert_allclose(
        np.asarray(det.boxes, np.float32)[v],
        np.asarray(back.boxes, np.float32)[np.asarray(back.valid)],
        atol=CFG.image_size * 2.0 ** -7)
    np.testing.assert_array_equal(np.asarray(det.classes)[v],
                                  np.asarray(back.classes)[v])
    np.testing.assert_allclose(np.asarray(det.scores)[v],
                               np.asarray(back.scores)[v], atol=1e-5)


def test_forward_tta_query_family():
    qcfg = dataclasses.replace(
        CFG, family="query", fpn_dim=64, num_queries=16, query_layers=2,
        score_threshold=0.01)
    params = DET.init_detector(jax.random.PRNGKey(1), qcfg)
    imgs = _frame(np.random.default_rng(1), qcfg.image_size)
    det = DET.forward_tta(params, imgs, qcfg)
    assert det.boxes.shape == (2, qcfg.max_detections, 4)
    assert np.asarray(det.boxes).max() <= qcfg.image_size
