#!/usr/bin/env python
"""Replay a recorded experiment directory (ref: experimenting_env/replay.py:
119-151 replay_experiment + scripts/visualize_exp.py): iterate the npz store,
optionally re-running batched caption+detect over the replayed frames
(BASELINE config #2: 500-frame replay caption+detect)."""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("exp_path")
    ap.add_argument("--preset", default="tiny")
    ap.add_argument("--perceive", action="store_true",
                    help="re-run detection+captioning on replayed frames")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--max-frames", type=int, default=500)
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    import numpy as np

    from embodied_captioning_tpu.config import load_config
    from embodied_captioning_tpu.utils.obs_store import SampleLoader

    loader = SampleLoader(args.exp_path)
    n_files = len(loader.episode_list)  # len(loader) = dense step count
    print(f"[replay] episodes={loader.episodes} files={n_files}")

    frames = []
    for ep in loader.episodes:
        for cam in loader.cameras(ep):
            if "rgb" not in loader.modalities(ep, cam):
                continue
            for step in loader.steps(ep, cam, "rgb"):
                frames.append((ep, cam, step))
    frames = frames[: args.max_frames]
    print(f"[replay] {len(frames)} rgb frames")

    if not args.perceive:
        for ep, cam, step in frames[:10]:
            s = loader.get_sample(ep, cam, "rgb", step)
            print(f"  ep {ep} cam {cam} step {step}: rgb {s.data.shape}")
        return

    cfg = load_config(args.preset, overrides=list(args.overrides))
    from embodied_captioning_tpu.perception import Perceiver

    p = Perceiver(cfg)
    t0 = time.time()
    n_det = 0
    for i in range(0, len(frames), args.batch):
        batch = frames[i:i + args.batch]
        imgs = np.stack([
            loader.get_sample(ep, cam, "rgb", st).data
            for ep, cam, st in batch])
        result = p.process(imgs)
        n_det += int(np.asarray(result.detections.valid).sum())
    dt = time.time() - t0
    print(json.dumps({"frames": len(frames), "detections": n_det,
                      "seconds": round(dt, 2),
                      "fps": round(len(frames) / max(dt, 1e-6), 2)}))


if __name__ == "__main__":
    main()
