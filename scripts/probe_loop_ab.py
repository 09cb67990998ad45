#!/usr/bin/env python
"""Interleaved loop A/B: round-3 knob set vs round-4 trained artifact.

Round 4 measured the on-device loop (BENCH_MODE=loop) at 21.5-25.3 fps with
the trained serving artifact vs round 3's 50.8-55.9 fps with the
random-weight 1024^2 detector — and the decisive same-process interleaved
comparison was queued but never run (VERDICT round 4, weak #1). Tunnel/chip
throughput drifts across minutes, so the ONLY honest comparison alternates
both arms round-robin inside one process (CLAUDE.md).

Arms (both: large preset, int8, 4 caption slots, device RaycastSim loop):
  r3knobs   bench defaults with BENCH_DETECTOR_WEIGHTS=none — random-weight
            1024^2 detector (the exact round-3 loop workload)
  r4artifact the committed det_serving_256.pkl serving config + weights
            (the exact round-4 loop workload)

The two arms share ONE VectorEnv (identical 1280^2 sensors) and ONE
captioner/sbert param set (identical init key) — only the detector params +
serving config differ, which keeps both stacks resident inside the 16 GB
chip. Per round and arm this measures (a) pipelined perception fps
(8 launches, one fence) and (b) the double-buffered loop fps (fence per
iteration), so loop_over_perception is computed within the same minute for
both arms.
"""

import argparse
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=8,
                    help="loop iterations per (round, arm)")
    ap.add_argument("--rounds", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from embodied_captioning_tpu.config import load_config, merge
    from embodied_captioning_tpu.envs.vector_env import VectorEnv
    from embodied_captioning_tpu.models import detector as DET
    from embodied_captioning_tpu.models.quantize import quantize_params
    from embodied_captioning_tpu.perception import init_perception, perceive

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    art_path = os.path.join(root, "embodied_captioning_tpu", "models",
                            "data", "det_serving_256.pkl")

    base_over = ["runtime.caption_slots_per_frame=4",
                 "runtime.caption_invalid_slots=true",
                 f"runtime.num_envs={args.batch}"]
    cfg_a = load_config("large", overrides=base_over)
    with open(art_path, "rb") as fh:
        artifact = pickle.load(fh)
    cfg_b = merge(cfg_a, {"detector": artifact["serving_cfg"]})

    # ONE param init; arm B swaps only the detector
    params_a = quantize_params(init_perception(jax.random.PRNGKey(0), cfg_a))
    if "served" in artifact:
        det_b = jax.tree_util.tree_map(jnp.asarray, artifact["served"])
    else:
        det_b = artifact.get("affine")
        if det_b is not None and cfg_b.detector.norm == "affine":
            det_b = DET.fold_affine(
                jax.tree_util.tree_map(jnp.asarray, det_b), cfg_b.detector)
        else:
            best = (artifact.get("ema")
                    if artifact.get("best") == "ema" else None)
            det_b = jax.tree_util.tree_map(
                jnp.asarray, best or artifact["params"])
    params_b = quantize_params(params_a._replace(detector=det_b))

    def make_step(cfg):
        @jax.jit
        def step(params, images, key):
            r = perceive(params, images, key, cfg)
            return (jnp.sum(r.detections.boxes) + jnp.sum(r.detections.scores)
                    + jnp.sum(r.caption_tokens)
                    + jnp.sum(r.detections.embeddings))
        return step

    arms = [
        {"name": "r3knobs", "cfg": cfg_a, "params": params_a,
         "step": make_step(cfg_a)},
        {"name": "r4artifact", "cfg": cfg_b, "params": params_b,
         "step": make_step(cfg_b)},
    ]

    envs = VectorEnv(cfg_a)  # shared: sensors identical across arms
    obs = envs.observe()
    key = jax.random.PRNGKey(1)
    for arm in arms:
        t0 = time.perf_counter()
        cs = arm["step"](arm["params"], jnp.asarray(obs["rgb"], jnp.uint8),
                         key)
        _ = float(cs)
        print(f"[ab] {arm['name']} perception warm "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
        arm["perception_fps"] = []
        arm["loop_fps"] = []
    envs.step_async([1] * args.batch)
    obs, *_ = envs.step_wait()

    for rnd in range(args.rounds):
        for arm in arms:
            # (a) pipelined perception throughput (the bench.py headline
            # protocol: issue every launch, then fence all checksums)
            img = jnp.asarray(obs["rgb"], jnp.uint8)
            t0 = time.perf_counter()
            sums = []
            for i in range(args.iters):
                key, sub = jax.random.split(key)
                sums.append(arm["step"](arm["params"], img, sub))
            total = float(sum(float(c) for c in sums))
            dt = time.perf_counter() - t0
            assert np.isfinite(total)
            p_fps = args.batch * args.iters / dt
            arm["perception_fps"].append(round(p_fps, 2))
            # (b) the double-buffered loop: fence per iteration
            t0 = time.perf_counter()
            for i in range(args.iters):
                key, sub = jax.random.split(key)
                cs = arm["step"](arm["params"],
                                 jnp.asarray(obs["rgb"], jnp.uint8), sub)
                envs.step_async([1 + (i % 3)] * args.batch)
                _ = float(cs)
                obs, *_ = envs.step_wait()
            dt = time.perf_counter() - t0
            l_fps = args.batch * args.iters / dt
            arm["loop_fps"].append(round(l_fps, 2))
            print(f"[ab] round {rnd} {arm['name']}: perception "
                  f"{p_fps:.1f} fps, loop {l_fps:.1f} fps", flush=True)

    envs.close()
    out = {"batch": args.batch, "iters": args.iters, "rounds": args.rounds}
    for arm in arms:
        lf = np.asarray(arm["loop_fps"])
        pf = np.asarray(arm["perception_fps"])
        out[arm["name"]] = {
            "perception_fps": arm["perception_fps"],
            "loop_fps": arm["loop_fps"],
            "loop_mean": round(float(lf.mean()), 2),
            "loop_std": round(float(lf.std()), 2),
            "loop_over_perception": round(float(lf.mean() / pf.mean()), 3),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
