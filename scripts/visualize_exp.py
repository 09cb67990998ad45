#!/usr/bin/env python
"""Visualize a recorded experiment: render annotated PNG frames (headless
replacement for the reference's cv2.imshow replay viewer,
ref: experimenting_env/replay.py:119-151 + scripts/visualize_exp.py +
confs/replay/rgb_depth_multicam.yaml). Draws detection boxes, class names,
captions, and a depth colormap side-by-side."""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("ECAP_PLATFORM", "cpu")


def _draw_frame(rgb, depth, bbs, class_names):
    import numpy as np
    from PIL import Image, ImageDraw

    h, w = rgb.shape[:2]
    canvas = Image.new("RGB", (w * 2 + 4, h), (30, 30, 30))
    img = Image.fromarray(rgb.astype(np.uint8))
    draw = ImageDraw.Draw(img)
    if bbs is not None:
        valid = np.asarray(bbs.get("valid", []), bool)
        boxes = np.asarray(bbs.get("boxes", np.zeros((0, 4))))
        classes = np.asarray(bbs.get("classes", []))
        captions = bbs.get("captions")
        palette = [(255, 80, 80), (80, 255, 80), (80, 80, 255),
                   (255, 255, 80), (255, 80, 255), (80, 255, 255)]
        for i in np.nonzero(valid)[0]:
            x1, y1, x2, y2 = [float(v) for v in boxes[i]]
            c = palette[int(classes[i]) % len(palette)]
            draw.rectangle([x1, y1, x2, y2], outline=c, width=2)
            label = class_names[int(classes[i])]
            if captions is not None and i < len(captions):
                label = f"{label}: {captions[i]}"[:48]
            draw.text((x1 + 2, max(0, y1 - 10)), label, fill=c)
    canvas.paste(img, (0, 0))
    if depth is not None:
        d = np.asarray(depth, np.float32)
        dn = (d - d.min()) / max(d.max() - d.min(), 1e-6)
        dm = (np.stack([dn, 1 - dn, np.ones_like(dn) * 0.3], -1) * 255
              ).astype(np.uint8)
        canvas.paste(Image.fromarray(dm), (w + 4, 0))
    return canvas


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("exp_path")
    ap.add_argument("--out", default="viz_frames")
    ap.add_argument("--max-frames", type=int, default=50)
    args = ap.parse_args()

    import numpy as np

    from embodied_captioning_tpu.config import CLASS_NAMES
    from embodied_captioning_tpu.utils.obs_store import SampleLoader

    loader = SampleLoader(args.exp_path)
    os.makedirs(args.out, exist_ok=True)
    n = 0
    for ep in loader.episodes:
        cams = loader.cameras(ep)
        rgb_cam = next((c for c in cams
                        if "rgb" in loader.modalities(ep, c)), None)
        if rgb_cam is None:
            continue
        for step in loader.steps(ep, rgb_cam, "rgb"):
            if n >= args.max_frames:
                break
            rgb = loader.get_sample(ep, rgb_cam, "rgb", step).data
            depth = None
            bbs = None
            for c in cams:
                mods = loader.modalities(ep, c)
                if "depth" in mods and step in loader.paths[ep][c]["depth"]:
                    depth = loader.get_sample(ep, c, "depth", step).data
                for m in ("bbs", "bbsgt"):
                    if m in mods and step in loader.paths[ep][c][m]:
                        bbs = loader.get_sample(ep, c, m, step).data
            frame = _draw_frame(rgb, depth, bbs, CLASS_NAMES)
            frame.save(os.path.join(args.out,
                                    f"ep{ep:06d}_step{step:05d}.png"))
            n += 1
    print(json.dumps({"frames": n, "out": args.out}))


if __name__ == "__main__":
    main()
