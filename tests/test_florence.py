"""Florence-2-class unified model: loc-token codec, loss, task-conditioned
generation, OD sequence parsing, and that it can learn a detection."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from embodied_captioning_tpu.models import florence as F

CFG = F.FlorenceConfig.tiny()


def test_loc_token_roundtrip():
    boxes = np.array([[4, 8, 30, 50], [0, 0, 63.9, 63.9]], np.float32)
    toks = F.boxes_to_loc_tokens(boxes, 64, CFG)
    assert (toks >= CFG.loc_offset).all()
    assert (toks < CFG.loc_offset + F.NUM_LOC_BINS).all()
    back = F.loc_tokens_to_boxes(toks, 64, CFG)
    assert np.abs(back - boxes).max() <= 64 / F.NUM_LOC_BINS


def test_od_sequence_roundtrip():
    boxes = np.array([[4, 8, 30, 50]], np.float32)
    classes = np.array([2])
    seq = F.encode_od_targets(boxes, classes, np.array([True]), 64, CFG)
    assert seq[1] == CFG.task_offset + F.TASK_OD
    got_boxes, got_classes = F.decode_od_sequence(
        np.asarray(seq[2:]), 64, CFG)
    assert got_classes.tolist() == [2]
    assert np.abs(got_boxes - boxes).max() <= 64 / F.NUM_LOC_BINS
    # garbage sequences parse to empty, no crash
    gb, gc = F.decode_od_sequence(np.asarray([5, 7, 9]), 64, CFG)
    assert len(gb) == 0


def test_generation_tasks(rng):
    params = F.init_florence(jax.random.PRNGKey(0), CFG)
    imgs = jnp.asarray((rng.random((2, 64, 64, 3)) * 255).astype(np.uint8))
    toks, lens = F.generate(params, imgs, CFG, task=F.TASK_CAPTION,
                            max_len=16)
    assert toks.shape == (2, 16)
    assert int(toks[0, 1]) == CFG.task_offset + F.TASK_CAPTION
    fl = F.Florence(CFG, params=params)
    caps = fl.caption(np.asarray(imgs))
    assert len(caps) == 2
    dets = fl.detect(np.asarray(imgs))
    assert len(dets) == 2  # (boxes, classes) tuples, possibly empty


def test_florence_learns_od(rng):
    """Overfit one image's OD sequence — the detection-as-language loop."""
    params = F.init_florence(jax.random.PRNGKey(0), CFG)
    img = jnp.asarray((rng.random((1, 64, 64, 3)) * 255).astype(np.uint8))
    boxes = np.array([[8, 8, 40, 48]], np.float32)
    seq = F.encode_od_targets(boxes, np.array([3]), np.array([True]), 64,
                              CFG)
    tokens = np.full((1, 16), F.PAD_ID, np.int32)
    tokens[0, :len(seq)] = seq
    tokens = jnp.asarray(tokens)
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(
            lambda p: F.florence_loss(p, img, tokens, CFG))(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    first = None
    for i in range(150):
        params, opt_state, loss = step(params, opt_state)
        first = first if first is not None else float(loss)
    assert float(loss) < 0.1 < first
    dets = F.Florence(CFG, params=params).detect(np.asarray(img))
    got_boxes, got_classes = dets[0]
    assert got_classes.tolist() == [3]
    assert np.abs(got_boxes[0] - boxes[0]).max() <= 2 * 64 / F.NUM_LOC_BINS
