#!/usr/bin/env python
"""Probe: detector backbone+FPN attribution at the serving operating point.

The round-3 stage split (docs/BENCH.md) puts backbone+FPN at ~81 ms per
8-frame batch at 1024^2 — by far the largest single block in the fused
program — at roughly 15% MFU. This probe attributes that time:

  stages   fenced per-stage timing: stem+pool / res2..res5 / FPN+P6
  fold     affine-norm folded INTO the conv weights (w' = w*g,
           b' = b_conv*g + b_norm): if XLA already fuses the affine
           epilogue this is a no-op; if not it deletes one elementwise
           pass per conv
  f32bias  the conv epilogue casts to f32 for the bias add
           (models/detector.conv); variant keeps the epilogue in bf16

Usage: BENCH_PRESET=large python scripts/probe_backbone.py [--batch 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from embodied_captioning_tpu.config import load_config
    from embodied_captioning_tpu.models import detector as DET

    preset = os.environ.get("BENCH_PRESET", "large")
    cfg0 = load_config(preset)
    cfg = cfg0.detector
    params = DET.init_detector(jax.random.PRNGKey(0), cfg)
    size = cfg.image_size
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.random((args.batch, size, size, 3)).astype(np.float32))

    def timed(name, fn, *fargs):
        jfn = jax.jit(fn)
        _ = float(jfn(*fargs))  # compile + warm
        ts = []
        for _i in range(args.iters):
            t0 = time.perf_counter()
            _ = float(jfn(*fargs))
            ts.append(time.perf_counter() - t0)
        ms = 1000.0 * sorted(ts)[len(ts) // 2]
        print(f"  {name:<34s} {ms:8.2f} ms", flush=True)
        return ms

    print(f"[probe_backbone] preset={preset} size={size} batch={args.batch} "
          f"norm={cfg.norm} depths={cfg.backbone_depths} "
          f"width={cfg.backbone_width}", flush=True)

    fence = timed("fence (null program)", lambda x: jnp.sum(x),
                  jnp.ones((8,), jnp.float32))

    # --- full backbone+FPN (reference point) ------------------------------
    def full(p, x):
        fpn = DET.backbone_fpn(p, x, cfg)
        return sum(jnp.sum(f.astype(jnp.float32)) for f in fpn)

    base = timed("backbone+FPN (current)", full, params, images)

    # --- per-stage attribution --------------------------------------------
    gn = DET.norm_fn(cfg)

    def stem_only(p, x):
        y = jax.nn.relu(gn(p["stem_gn"], DET.conv(p["stem"], x, stride=2)))
        neg = y.dtype.type(-jnp.inf)
        y = jax.lax.reduce_window(y, neg, jax.lax.max, (1, 3, 3, 1),
                                  (1, 2, 2, 1), "SAME")
        return jnp.sum(y.astype(jnp.float32))

    timed("stem+pool", stem_only, params, images)

    # stage-by-stage: run the prefix up to stage i (fenced deltas attribute
    # each stage; the prefix re-runs but deltas subtract out)
    def prefix(p, x, upto):
        y = jax.nn.relu(gn(p["stem_gn"], DET.conv(p["stem"], x, stride=2)))
        neg = y.dtype.type(-jnp.inf)
        y = jax.lax.reduce_window(y, neg, jax.lax.max, (1, 3, 3, 1),
                                  (1, 2, 2, 1), "SAME")
        for si, blocks in enumerate(p["stages"][:upto]):
            for bi, blk in enumerate(blocks):
                stride = 2 if (bi == 0 and si > 0) else 1
                if "c3" in blk:
                    h = jax.nn.relu(gn(blk["g1"], DET.conv(blk["c1"], y)))
                    h = jax.nn.relu(gn(blk["g2"], DET.conv(blk["c2"], h,
                                                           stride=stride)))
                    h = gn(blk["g3"], DET.conv(blk["c3"], h))
                    if blk["sc"] is not None:
                        sc = DET.conv(blk["sc"], y, stride=stride)
                    elif stride == 2:
                        sc = y[:, ::2, ::2, :]
                    else:
                        sc = y
                else:
                    h = jax.nn.relu(gn(blk["g1"], DET.conv(blk["c1"], y,
                                                           stride=stride)))
                    h = gn(blk["g2"], DET.conv(blk["c2"], h))
                    if stride == 2 or blk["sc"] is not None:
                        sc = y if blk["sc"] is None else DET.conv(blk["sc"], y)
                        if stride == 2:
                            sc = sc[:, ::2, ::2, :]
                    else:
                        sc = y
                y = jax.nn.relu(h + sc)
        return jnp.sum(y.astype(jnp.float32))

    prev = timed("prefix: stem only",
                 lambda p, x: prefix(p, x, 0), params, images)
    for i in range(1, len(cfg.backbone_depths) + 1):
        cur = timed(f"prefix: through res{i + 1}",
                    lambda p, x, i=i: prefix(p, x, i), params, images)
        print(f"    -> res{i + 1} delta {cur - prev:8.2f} ms", flush=True)
        prev = cur
    print(f"    -> FPN+RPN-levels delta {base - prev:8.2f} ms "
          f"(incl. fence diff)", flush=True)

    # --- affine fold variant ----------------------------------------------
    if cfg.norm == "affine":
        folded = DET.fold_affine(params, cfg)
        timed("backbone+FPN (affine folded)",
              lambda p, x: full(p, x), folded, images)

    # --- space-to-depth stem variant (exact rewrite) ------------------------
    import dataclasses

    cfg_s2d = dataclasses.replace(cfg, stem_s2d=True)

    def full_s2d(p, x):
        fpn = DET.backbone_fpn(p, x, cfg_s2d)
        return sum(jnp.sum(f.astype(jnp.float32)) for f in fpn)

    timed("backbone+FPN (s2d stem)", full_s2d, params, images)

    def stem_s2d_only(p, x):
        y = jax.nn.relu(gn(p["stem_gn"], DET._stem_s2d(p["stem"], x)))
        neg = y.dtype.type(-jnp.inf)
        y = jax.lax.reduce_window(y, neg, jax.lax.max, (1, 3, 3, 1),
                                  (1, 2, 2, 1), "SAME")
        return jnp.sum(y.astype(jnp.float32))

    timed("stem+pool (s2d)", stem_s2d_only, params, images)

    # rough roofline context
    print(f"  fence-corrected current: {base - fence:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
