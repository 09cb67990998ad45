"""SemanticMapConsensusLabeler: accumulate + raytrace pseudo-labels from
synthetic samples with depth/pose (no perceiver needed)."""

import numpy as np
import pytest

from embodied_captioning_tpu.config import NUM_CLASSES, load_config
from embodied_captioning_tpu.labeling.datasets import Sample
from embodied_captioning_tpu.labeling.pseudolabeler import (
    SemanticMapConsensusLabeler,
)
from embodied_captioning_tpu.sensor_data import Pose, quat_from_yaw

CFG = load_config("tiny", overrides=[
    "map.voxel_size=0.1", "sensors.hfov_deg=90.0", "sensors.min_depth=0.5",
    "sensors.max_depth=3.5",
])


def _sample(step, cls=2):
    h = w = 32
    depth = np.full((h, w), 4.0, np.float32)
    masks = np.zeros((4, h, w), np.float32)
    masks[0, 8:24, 10:24] = 1.0
    depth[8:24, 10:24] = 2.0
    logits = np.zeros((4, NUM_CLASSES), np.float32)
    logits[0, cls] = 4.0
    pose = Pose(np.array([2.4, 0.0, 4.5]),
                quat_from_yaw(0.0)).camera_pose().matrix().astype(np.float32)
    return Sample(
        image=np.zeros((h, w, 3), np.uint8),
        boxes=np.array([[10, 8, 24, 24]] + [[0, 0, 0, 0]] * 3, np.float32),
        classes=np.array([cls, 0, 0, 0], np.int32),
        logits=logits,
        masks=masks,
        valid=np.array([True, False, False, False]),
        object_ids=np.array([500, -1, -1, -1], np.int64),
        depth=depth, pose=pose, episode=0, step=step)


def test_semantic_map_labeler_raytraces():
    labeler = SemanticMapConsensusLabeler(
        CFG, perceiver=object())  # perceiver unused for accumulate/labels
    preds = [_sample(s) for s in range(3)]
    out = labeler.get_pseudo_labels(preds)
    assert len(out) == 3
    got = [p for p in out if p.valid.any()]
    assert got, "raytracing produced no pseudo-instances"
    p = got[0]
    i = int(np.argmax(p.valid))
    assert p.classes[i] == 2
    assert p.logits[i].argmax() == 2
    # raytraced mask overlaps the source detection region
    assert p.masks[i][10:22, 12:22].mean() > 0.3
    # map kept a single fused object across the 3 views
    ep_map = labeler.global_maps[0]
    assert int(ep_map.num_objects) == 1
