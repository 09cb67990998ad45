"""Fixed detector-eval corpus round-trip (scripts/selfcheck_detector.py):
save -> load must reproduce identical bytes and checksum, and the checksum
must be order/content sensitive — the repeat-seed generalization rungs rely
on it to prove every rung evaluated the same corpus (docs/BENCH.md)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from selfcheck_detector import (  # noqa: E402
    corpus_checksum, load_corpus, save_corpus,
)

from embodied_captioning_tpu.ops.detections import Detections  # noqa: E402


def _frames(rng, n=3, size=16, slots=4, classes=6):
    out = []
    for _ in range(n):
        rgb = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
        det = Detections(
            boxes=rng.uniform(0, size, (slots, 4)).astype(np.float32),
            classes=rng.integers(0, classes, (slots,)).astype(np.int32),
            scores=rng.random((slots,), dtype=np.float32),
            logits=rng.random((slots, classes), dtype=np.float32),
            valid=rng.random((slots,)) < 0.7,
            masks=(rng.random((slots, size, size)) < 0.5).astype(np.uint8))
        out.append((rgb, det))
    return out


def test_corpus_roundtrip_identical(tmp_path, rng):
    frames = _frames(rng)
    path = tmp_path / "corpus.npz"
    save_corpus(path, frames)
    loaded = load_corpus(path)
    assert len(loaded) == len(frames)
    for (rgb0, d0), (rgb1, d1) in zip(frames, loaded):
        np.testing.assert_array_equal(rgb0, rgb1)
        for k in ("boxes", "classes", "scores", "logits", "valid", "masks"):
            np.testing.assert_array_equal(
                np.asarray(getattr(d0, k)), np.asarray(getattr(d1, k)))
    assert corpus_checksum(loaded) == corpus_checksum(frames)


def test_corpus_checksum_sensitive(rng):
    frames = _frames(rng)
    base = corpus_checksum(frames)
    # content change flips it
    rgb, det = frames[0]
    bumped = rgb.copy()
    bumped[0, 0, 0] ^= 1
    assert corpus_checksum([(bumped, det)] + frames[1:]) != base
    # order change flips it
    assert corpus_checksum(frames[::-1]) != base
