"""Labeling subsystem: datasets over the obs store, consensus labelers,
pseudo-captioner. Uses synthetic recorded episodes (the reference's own
offline test pattern: the npz store substitutes for a simulator,
ref: SURVEY.md §4)."""

import numpy as np
import pytest

from embodied_captioning_tpu.config import NUM_CLASSES, load_config
from embodied_captioning_tpu.labeling.datasets import (
    EpisodeDetectionDataset, apply_augmentation, collate,
)
from embodied_captioning_tpu.labeling.pseudolabeler import (
    MajorityConsensusLabeler, MaxScoreConsensusLabeler, SoftConsensusLabeler,
    VanillaConsensusLabeler, _group_by_object,
)
from embodied_captioning_tpu.labeling.datasets import Sample
from embodied_captioning_tpu.labeling.pseudocaptioner import (
    PseudoCaptioner, caption_frequencies, filter_banned, group_captions,
)
from embodied_captioning_tpu.utils.obs_store import save_obs


def _write_fake_episode(tmp_path, episode=0, steps=3, n=2):
    rng = np.random.default_rng(episode)
    for step in range(steps):
        rgb = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
        boxes = np.array([[2, 2, 12, 12], [18, 18, 30, 30]], np.float32)
        payload = {
            "boxes": boxes, "classes": np.array([1, 3], np.int32),
            "logits": np.eye(NUM_CLASSES, dtype=np.float32)[[1, 3]],
            "scores": np.array([0.9, 0.8], np.float32),
            "valid": np.array([True, True]),
            "object_ids": np.array([100, 101], np.int64),
            "captions": np.array(["a red couch", "a wooden table"],
                                 dtype=object),
        }
        obs = {
            "rgb": rgb,
            "depth": rng.random((32, 32)).astype(np.float32) * 3 + 1,
            "position": np.array({"position": np.zeros(3),
                                  "orientation": np.array([1, 0, 0, 0.0])},
                                 dtype=object),
            "bbs": np.array({"instances": payload}, dtype=object),
        }
        save_obs(str(tmp_path), episode, obs, step)


def test_dataset_roundtrip(tmp_path):
    _write_fake_episode(tmp_path)
    ds = EpisodeDetectionDataset(str(tmp_path), label_modality="bbs",
                                 with_depth_pose=True, max_detections=4)
    assert len(ds) == 3
    s = ds[0]
    assert s.image.shape == (32, 32, 3)
    assert s.valid.sum() == 2
    assert s.classes[0] == 1 and s.object_ids[1] == 101
    assert s.depth is not None and s.pose is not None
    assert s.pose.shape == (4, 4)
    batch = next(iter(ds.batches(2)))
    assert batch["image"].shape == (2, 32, 32, 3)
    assert batch["boxes"].shape == (2, 4, 4)


def test_sequential_and_partial_datasets(tmp_path):
    from embodied_captioning_tpu.labeling.datasets import (
        PartiallyAnnotatedEpisodeDataset, SequentialEpisodeDataset,
    )

    _write_fake_episode(tmp_path, steps=5)
    base = EpisodeDetectionDataset(str(tmp_path), label_modality="bbs",
                                   max_detections=4)
    seq = SequentialEpisodeDataset(base, window=3)
    assert len(seq) == 3  # 5 steps -> 3 windows
    w = seq[0]
    assert len(w) == 3 and w[0].step + 1 == w[1].step

    part = PartiallyAnnotatedEpisodeDataset(
        str(tmp_path), label_modality="bbs", max_detections=4,
        annotated_fraction=0.0)
    assert all(not part[i].valid.any() for i in range(len(part)))


def test_augmentations_keep_boxes_valid(tmp_path):
    _write_fake_episode(tmp_path)
    ds = EpisodeDetectionDataset(str(tmp_path), label_modality="bbs",
                                 max_detections=4)
    rng = np.random.default_rng(0)
    for name in ("none", "bbs_crop", "bbs_crop_strong", "strong_image"):
        s = ds[0]
        s2 = apply_augmentation(s, name, rng)
        h, w = s2.image.shape[:2]
        vb = s2.boxes[s2.valid]
        assert (vb[:, 0] >= 0).all() and (vb[:, 2] <= w).all()
        assert (vb[:, 2] > vb[:, 0]).all()


def _fake_preds():
    """Two frames, same object id seen twice with conflicting labels."""
    def mk(cls, logits_scale, step):
        n = 4
        s = Sample(
            image=np.zeros((32, 32, 3), np.uint8),
            boxes=np.zeros((n, 4), np.float32),
            classes=np.zeros((n,), np.int32),
            logits=np.zeros((n, NUM_CLASSES), np.float32),
            masks=np.zeros((n, 32, 32), np.float32),
            valid=np.zeros((n,), bool),
            object_ids=np.full((n,), -1, np.int64),
            episode=0, step=step)
        s.valid[0] = True
        s.classes[0] = cls
        s.logits[0, cls] = logits_scale
        s.object_ids[0] = 500
        return s

    return [mk(1, 0.9, 0), mk(1, 0.7, 1), mk(2, 0.95, 2)]


def test_majority_consensus():
    cfg = load_config("tiny")
    labeler = MajorityConsensusLabeler.__new__(MajorityConsensusLabeler)
    preds = _fake_preds()
    out = labeler.get_pseudo_labels(preds)
    # class 1 wins 2:1 -> all views relabeled to 1
    assert all(p.classes[0] == 1 for p in out)
    assert all(p.logits[0].argmax() == 1 for p in out)


def test_max_score_consensus():
    labeler = MaxScoreConsensusLabeler.__new__(MaxScoreConsensusLabeler)
    out = labeler.get_pseudo_labels(_fake_preds())
    # highest logit view is class 2 at 0.95 -> all become class 2
    assert all(p.classes[0] == 2 for p in out)


def test_soft_consensus():
    labeler = SoftConsensusLabeler.__new__(SoftConsensusLabeler)
    labeler.temperature = 2.0
    out = labeler.get_pseudo_labels(_fake_preds())
    for p in out:
        np.testing.assert_allclose(p.logits[0].sum(), 1.0, rtol=1e-5)
    # mean logits: class1 = (0.9+0.7)/3, class2 = 0.95/3 -> class1 wins
    assert all(p.classes[0] == 1 for p in out)


def test_build_sample_is_writable_from_device_arrays():
    """Samples built from the jitted Perceiver's output must be writable
    numpy (np.asarray of a jax array is a READ-ONLY view; the consensus
    stages relabel in place) and must carry the real detector scores."""
    import jax.numpy as jnp

    from embodied_captioning_tpu.labeling.pseudolabeler import (
        ConsensusLabeler,
    )
    from embodied_captioning_tpu.ops.detections import Detections

    n = 2
    det = Detections(
        boxes=jnp.asarray([[[1, 1, 5, 5], [2, 2, 6, 6]]], jnp.float32),
        classes=jnp.asarray([[1, 3]], jnp.int32),
        scores=jnp.asarray([[0.9, 0.4]], jnp.float32),
        logits=jnp.asarray(np.eye(NUM_CLASSES, dtype=np.float32)[[[1, 3]]]),
        valid=jnp.asarray([[True, True]]),
        masks=jnp.ones((1, n, 8, 8)),
        embeddings=jnp.ones((1, n, 4)),
    )
    batch = {"image": np.zeros((1, 8, 8, 3), np.uint8),
             "episode": np.array([0]), "step": np.array([0])}
    labeler = ConsensusLabeler.__new__(ConsensusLabeler)
    pred = labeler._build_sample(det, batch, 0)
    for arr in (pred.boxes, pred.classes, pred.logits, pred.valid):
        assert arr.flags.writeable
    pred.logits[0] = 0.5  # the in-place relabel the consensus stages do
    pred.classes[0] = 2
    np.testing.assert_allclose(pred.scores, [0.9, 0.4])
    assert pred.embeddings is not None and pred.embeddings.shape == (n, 4)


def test_save_pseudo_labels_real_scores(tmp_path):
    """Written npz must carry detector confidence, not uniform 1.0."""
    from embodied_captioning_tpu.labeling.pseudolabeler import (
        ConsensusLabeler,
    )

    preds = _fake_preds()
    for p in preds:
        p.scores = np.array([0.7] * len(p.valid), np.float32)
    paths = ConsensusLabeler.save_pseudo_labels(preds, str(tmp_path))
    raw = np.load(paths[0], allow_pickle=True)["arr_0"].item()
    payload = raw["instances"]
    valid = payload["valid"]
    np.testing.assert_allclose(payload["scores"][valid], 0.7)


def test_group_and_filter_captions():
    recs = [
        {"episode": 0, "object_id": 5, "caption": "a red couch"},
        {"episode": 0, "object_id": 5, "caption": "a blurry mess"},
        {"episode": 0, "object_id": 6, "caption": "a tv"},
    ]
    groups = group_captions(recs)
    assert len(groups[(0, 5)]) == 2
    kept = filter_banned(groups[(0, 5)])
    assert kept == ["a red couch"]
    freq = caption_frequencies(["A tv", "a tv", "a couch"])
    assert freq["a tv"] == 2


def test_pseudocaptioner_sbert_and_tfidf():
    cfg = load_config("tiny")
    pc = PseudoCaptioner(cfg, method="sbert")
    groups = {(0, 1): ["a red couch", "a red couch", "a green plant"],
              (0, 2): ["a tv"]}
    out = pc.consensus(groups)
    assert out["0_1"] == "a red couch"  # centroid-closest of 2-vs-1
    assert out["0_2"] == "a tv"
    pc2 = PseudoCaptioner(cfg, method="tfidf")
    out2 = pc2.consensus(groups)
    assert out2["0_1"] == "a red couch"
    # llm method falls back cleanly without local weights
    pc3 = PseudoCaptioner(cfg, method="llm")
    assert pc3.consensus(groups)["0_1"] == "a red couch"
