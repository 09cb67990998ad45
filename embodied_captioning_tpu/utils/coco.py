"""COCO-format detection tooling.

Replaces the reference's detectron2/pycocotools glue (ref: experimenting_env/
detector/utils.py:89-137 `coco_laoder` filtered 6-class COCO loader;
:140-212 `coco_evaluate` COCOEvaluator harness; utils/detectron_utils.py:
174-198 `get_coco_item_dict`): export padded Detections to COCO-json,
import COCO-json annotations into dataset Samples (remapping the 6 target
COCO category ids to local ids), and evaluate with the framework's AP.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..config import CLASS_NAMES, COCO_CLASS_IDS, COCO_TO_LOCAL, NUM_CLASSES


def detections_to_coco(detections: Sequence, image_ids: Sequence[int],
                       use_coco_ids: bool = True) -> List[Dict]:
    """Padded Detections list -> COCO results list (xywh boxes)."""
    out: List[Dict] = []
    for det, img_id in zip(detections, image_ids):
        v = np.asarray(det.valid)
        boxes = np.asarray(det.boxes)
        classes = np.asarray(det.classes)
        scores = np.asarray(det.scores)
        for i in np.nonzero(v)[0]:
            x1, y1, x2, y2 = boxes[i]
            cat = (COCO_CLASS_IDS[int(classes[i])] if use_coco_ids
                   else int(classes[i]))
            out.append({
                "image_id": int(img_id),
                "category_id": int(cat),
                "bbox": [float(x1), float(y1), float(x2 - x1),
                         float(y2 - y1)],
                "score": float(scores[i]),
            })
    return out


def coco_to_samples(coco_json: str, images_root: Optional[str] = None,
                    filter_target_classes: bool = True) -> List[Dict]:
    """COCO annotation json -> list of {image_path, boxes, classes} dicts
    with local class ids (the 6-class filtered loader,
    ref: detector/utils.py:89-137)."""
    with open(coco_json) as fh:
        coco = json.load(fh)
    images = {im["id"]: im for im in coco.get("images", [])}
    per_image: Dict[int, Dict] = {}
    for ann in coco.get("annotations", []):
        cat = ann["category_id"]
        if filter_target_classes:
            if cat not in COCO_TO_LOCAL:
                continue
            cls = COCO_TO_LOCAL[cat]
        else:
            cls = cat
        img_id = ann["image_id"]
        rec = per_image.setdefault(img_id, {"boxes": [], "classes": []})
        x, y, w, h = ann["bbox"]
        rec["boxes"].append([x, y, x + w, y + h])
        rec["classes"].append(cls)
    # annotation-free images MUST appear (empty GT): dropping them would
    # let evaluate_coco ignore every prediction on them, so hallucinated
    # false positives would go uncounted and inflate AP
    for img_id in images:
        per_image.setdefault(img_id, {"boxes": [], "classes": []})
    out = []
    for img_id, rec in sorted(per_image.items()):
        im = images.get(img_id, {})
        path = im.get("file_name", "")
        if images_root and path:
            path = os.path.join(images_root, path)
        out.append({
            "image_id": img_id,
            "image_path": path,
            "width": im.get("width"),
            "height": im.get("height"),
            "boxes": np.asarray(rec["boxes"], np.float32),
            "classes": np.asarray(rec["classes"], np.int32),
        })
    return out


def evaluate_coco(results: List[Dict], gt_samples: List[Dict],
                  iou_thresholds=(0.5,)) -> Dict[str, float]:
    """AP over COCO-format results vs coco_to_samples ground truth
    (the COCOEvaluator role, ref: detector/utils.py:140-212)."""
    from .metrics import average_precision

    by_img: Dict[int, List[Dict]] = {}
    for r in results:
        by_img.setdefault(r["image_id"], []).append(r)
    pb, ps, pc, gb, gc = [], [], [], [], []
    for g in gt_samples:
        rows = by_img.get(g["image_id"], [])
        boxes, scores, classes = [], [], []
        for r in rows:
            cat = r["category_id"]
            # accept COCO target ids (57-62) or already-local ids (0-5);
            # anything else is an out-of-target detection and is filtered
            # (passing a raw COCO id through would collide with local ids)
            if cat in COCO_TO_LOCAL:
                cls = COCO_TO_LOCAL[cat]
            elif 0 <= cat < NUM_CLASSES:
                cls = cat
            else:
                continue
            x, y, w, h = r["bbox"]
            boxes.append([x, y, x + w, y + h])
            scores.append(r["score"])
            classes.append(cls)
        pb.append(np.asarray(boxes, np.float32).reshape(-1, 4))
        ps.append(np.asarray(scores, np.float32))
        pc.append(np.asarray(classes, np.int64))
        gb.append(g["boxes"].reshape(-1, 4))
        gc.append(g["classes"])
    return average_precision(pb, ps, pc, gb, gc, NUM_CLASSES, iou_thresholds)
