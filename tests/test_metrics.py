"""Caption + detection metric tests."""

import numpy as np

from embodied_captioning_tpu.utils.metrics import (
    average_precision, bleu, caption_scores, mean_pairwise_cosine, meteor,
    rouge_l, rouge_n,
)


def test_bleu_identity_and_zero():
    assert bleu("a red couch", ["a red couch"]) > 0.99
    assert bleu("xyz abc", ["completely different words here"]) < 0.1
    assert bleu("", ["a"]) == 0.0
    # adaptive order: 2-word captions still score
    assert bleu("red couch", ["red couch"]) > 0.9


def test_meteor_ordering():
    perfect = meteor("a red couch in the room", "a red couch in the room")
    partial = meteor("a red chair", "a red couch")
    assert perfect > 0.9
    assert 0 < partial < perfect
    assert meteor("zzz", "a red couch") == 0.0


def test_rouge():
    assert rouge_n("a red couch", "a red couch", 1) == 1.0
    assert rouge_n("a red couch", "a red couch", 2) == 1.0
    assert rouge_l("the cat sat", "the cat sat") == 1.0
    assert rouge_l("a b c d", "a x c y") == 0.5
    s = caption_scores("a red couch", "a red sofa")
    assert set(s) == {"bleu", "meteor", "rouge1", "rouge2", "rougeL"}


def test_mean_pairwise_cosine():
    e = np.tile(np.array([[1.0, 0.0]]), (4, 1))
    assert abs(mean_pairwise_cosine(e) - 1.0) < 1e-9
    e2 = np.array([[1.0, 0.0], [0.0, 1.0]])
    # diag included: (1 + 0 + 0 + 1) / 4
    assert abs(mean_pairwise_cosine(e2) - 0.5) < 1e-9
    assert mean_pairwise_cosine(np.zeros((1, 3))) == 1.0


def test_average_precision_perfect_and_miss():
    gt_b = [np.array([[0, 0, 10, 10], [20, 20, 30, 30]], np.float32)]
    gt_c = [np.array([0, 1])]
    # perfect predictions
    res = average_precision(gt_b, [np.array([0.9, 0.8])], gt_c,
                            gt_b, gt_c, num_classes=2)
    assert abs(res["map"] - 1.0) < 1e-6
    # wrong class predictions
    res2 = average_precision(gt_b, [np.array([0.9, 0.8])],
                             [np.array([1, 0])], gt_b, gt_c, num_classes=2)
    assert res2["map"] < 0.1
    # no predictions at all
    res3 = average_precision([np.zeros((0, 4))], [np.zeros(0)],
                             [np.zeros(0, np.int64)], gt_b, gt_c, 2)
    assert res3["map"] == 0.0
