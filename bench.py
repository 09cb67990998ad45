#!/usr/bin/env python
"""Headline benchmark: captioned+detected frames/sec/chip.

BASELINE.md target: >= 64 captioned+detected frames/sec/chip on TPU v5e
(`vs_baseline` = fps / 64). The measured program is the fused perception
pipeline (detector forward + box crops + KV-cached batched caption decode +
sentence embedding) — the reference's per-step hot path
(ref: goal_exploration.py:77-144).

Prints ONE JSON line. Env knobs: BENCH_PRESET (tiny|base|large, default
base), BENCH_BATCH (frames per launch, default 16), BENCH_ITERS (default 8).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    preset = os.environ.get("BENCH_PRESET", "base")
    batch = int(os.environ.get("BENCH_BATCH", "16"))
    iters = int(os.environ.get("BENCH_ITERS", "8"))

    import jax
    import numpy as np

    from embodied_captioning_tpu.config import load_config
    from embodied_captioning_tpu.perception import init_perception, perceive

    cfg = load_config(preset)
    params = init_perception(jax.random.PRNGKey(0), cfg)
    size = cfg.detector.image_size
    rng_np = np.random.default_rng(0)
    images = jax.numpy.asarray(
        (rng_np.random((batch, size, size, 3)) * 255).astype(np.uint8))
    key = jax.random.PRNGKey(1)

    # warmup / compile
    result = perceive(params, images, key, cfg)
    jax.block_until_ready(result.detections.boxes)

    t0 = time.perf_counter()
    for i in range(iters):
        key, sub = jax.random.split(key)
        result = perceive(params, images, sub, cfg)
    jax.block_until_ready(result.detections.boxes)
    dt = time.perf_counter() - t0

    frames = batch * iters
    fps = frames / dt
    print(json.dumps({
        "metric": "captioned+detected frames/sec/chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 64.0, 3),
        "detail": {
            "preset": preset, "batch": batch, "iters": iters,
            "detector_size": size,
            "caption_len": cfg.captioner.max_caption_len,
            "max_detections": cfg.detector.max_detections,
            "p50_ms_per_frame": round(1000.0 * dt / frames, 2),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
