"""Caption fine-tuning datasets: images directory and crop-CSV forms.

Parity with the reference's caption datasets (ref: experimenting_env/
captioner/captioning_datasets/base_dataset.py:1-75 — directory of images
with caption sidecars; detection_dataset.py:1-133 — CSV of (image, box,
caption) crop rows). Batches are padded uint8 crop stacks + token arrays,
ready for train/captioner_train.train_step.
"""

from __future__ import annotations

import csv
import os
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np


def _load_image(path: str) -> np.ndarray:
    if path.endswith(".npz"):
        return np.load(path, allow_pickle=True)["arr_0"]
    if path.endswith(".npy"):
        return np.load(path)
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"))


class CaptioningBaseDataset:
    """Directory of images with captions from a sidecar
    (`captions.csv|json` mapping filename -> caption) or per-image `.txt`
    files (ref: base_dataset.py)."""

    def __init__(self, images_dir: str,
                 captions_file: Optional[str] = None):
        self.images_dir = images_dir
        self.items: List[Tuple[str, str]] = []
        caps: Dict[str, str] = {}
        captions_file = captions_file or next(
            (os.path.join(images_dir, n) for n in ("captions.csv",
                                                   "captions.json")
             if os.path.exists(os.path.join(images_dir, n))), None)
        if captions_file and captions_file.endswith(".csv"):
            with open(captions_file) as fh:
                for row in csv.DictReader(fh):
                    caps[row["image"]] = row["caption"]
        elif captions_file and captions_file.endswith(".json"):
            import json

            caps = json.load(open(captions_file))
        for name in sorted(os.listdir(images_dir)):
            if not name.lower().endswith((".png", ".jpg", ".jpeg", ".npz",
                                          ".npy")):
                continue
            path = os.path.join(images_dir, name)
            cap = caps.get(name)
            if cap is None:
                txt = os.path.splitext(path)[0] + ".txt"
                if os.path.exists(txt):
                    cap = open(txt).read().strip()
            if cap:
                self.items.append((path, cap))

    def __len__(self) -> int:
        return len(self.items)

    def __getitem__(self, i: int) -> Tuple[np.ndarray, str]:
        path, cap = self.items[i]
        return _load_image(path), cap


class DetectionCropDataset:
    """CSV of crops: columns image,x1,y1,x2,y2,caption[,object_id]
    (ref: detection_dataset.py). Crops are expanded 0.2 and resized to
    `crop_size` (the captioner's input)."""

    def __init__(self, csv_path: str, crop_size: int = 224,
                 images_root: Optional[str] = None):
        self.rows: List[Dict] = []
        self.crop_size = crop_size
        root = images_root or os.path.dirname(os.path.abspath(csv_path))
        with open(csv_path) as fh:
            for row in csv.DictReader(fh):
                path = row["image"]
                if not os.path.isabs(path):
                    path = os.path.join(root, path)
                self.rows.append({
                    "image": path,
                    "box": [float(row["x1"]), float(row["y1"]),
                            float(row["x2"]), float(row["y2"])],
                    "caption": row["caption"],
                    "object_id": int(row.get("object_id", -1) or -1),
                })

    def __len__(self) -> int:
        return len(self.rows)

    def __getitem__(self, i: int) -> Tuple[np.ndarray, str, int]:
        import jax.numpy as jnp

        from ..ops.detections import expand_boxes
        from ..ops.image import crop_and_resize

        r = self.rows[i]
        img = _load_image(r["image"])
        h, w = img.shape[:2]
        box = expand_boxes(jnp.asarray([r["box"]], jnp.float32), 0.2, h, w)
        crop = crop_and_resize(jnp.asarray(img, jnp.float32), box,
                               self.crop_size)[0]
        return (np.clip(np.asarray(crop), 0, 255).astype(np.uint8),
                r["caption"], r["object_id"])

    def batches(self, tokenizer, context_length: int, batch_size: int,
                shuffle: bool = True, seed: int = 0
                ) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self))
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        for i in range(0, len(order) - batch_size + 1, batch_size):
            crops, caps, ids = zip(*[self[j] for j in order[i:i + batch_size]])
            yield {
                "image": np.stack(crops),
                "tokens": tokenizer.encode_batch(list(caps), context_length),
                "object_ids": np.asarray(ids, np.int32),
                "valid": np.ones(batch_size, bool),
            }
