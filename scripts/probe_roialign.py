#!/usr/bin/env python
"""Probe: ROIAlign separable-contraction spellings at serving shapes.

The round-3 device trace shows a 2.9 ms relayout copy
(bf16[1792,8,128,256]{3,1,2,0} -> {3,2,1,0}) between roi_align's two
einsums — XLA disagrees with itself about which free dim of the row-interp
intermediate should be minor. Variants (parity-checked, faithful to the
vmapped-per-image program: B feature maps x P rois each):

  A rows-first (current): rows = wy@img [B,P,S,W,C]; out = wx . rows
  B cols-first:           cols = wx@img [B,P,T,H,C]; out = wy . cols
  C rows-first, swapped out axes + final transpose

Usage: python scripts/probe_roialign.py [--frames 16 --rois 128]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--rois", type=int, default=128)
    ap.add_argument("--feat", type=int, default=128)   # P3 at 1024^2
    ap.add_argument("--chans", type=int, default=256)
    ap.add_argument("--out", type=int, default=7)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from embodied_captioning_tpu.ops.image import _box_interp_weights

    b, p, h, c, s = args.frames, args.rois, args.feat, args.chans, args.out
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.standard_normal((b, h, h, c)).astype(np.float32)
                       ).astype(jnp.bfloat16)
    boxes = jnp.asarray(
        np.stack([rng.uniform(0, h // 2, (b, p)),
                  rng.uniform(0, h // 2, (b, p)),
                  rng.uniform(h // 2, h, (b, p)),
                  rng.uniform(h // 2, h, (b, p))],
                 axis=-1).astype(np.float32))
    wy, wx = jax.vmap(lambda bx: _box_interp_weights(bx, s, h, h))(boxes)
    # wy/wx: [B, P, S, H]

    def var_a(feat, wy, wx):
        def one(f, y, x):
            imgf = f.astype(jnp.float32).reshape(h, h * c)
            rows = jnp.einsum("nsh,hk->nsk", y, imgf,
                              preferred_element_type=jnp.float32)
            rows = rows.reshape(-1, s, h, c)
            return jnp.einsum("ntw,nswc->nstc", x, rows,
                              preferred_element_type=jnp.float32)

        return jax.vmap(one)(feat, wy, wx)

    def var_b(feat, wy, wx):
        def one(f, y, x):
            imgf = jnp.transpose(f.astype(jnp.float32), (1, 0, 2)
                                 ).reshape(h, h * c)
            cols = jnp.einsum("ntw,wk->ntk", x, imgf,
                              preferred_element_type=jnp.float32)
            cols = cols.reshape(-1, s, h, c)  # [P, T, H, C]
            return jnp.einsum("nsh,nthc->nstc", y, cols,
                              preferred_element_type=jnp.float32)

        return jax.vmap(one)(feat, wy, wx)

    def var_c(feat, wy, wx):
        def one(f, y, x):
            imgf = f.astype(jnp.float32).reshape(h, h * c)
            rows = jnp.einsum("nsh,hk->nsk", y, imgf,
                              preferred_element_type=jnp.float32)
            rows = rows.reshape(-1, s, h, c)
            out = jnp.einsum("ntw,nswc->ntsc", x, rows,
                             preferred_element_type=jnp.float32)
            return jnp.transpose(out, (0, 2, 1, 3))

        return jax.vmap(one)(feat, wy, wx)

    fns = {"A rows-first (current)": var_a, "B cols-first": var_b,
           "C swapped-out": var_c}
    # elementwise parity on the FULL outputs (a scalar-sum check would let
    # a permuted/transposed output cancel to the same total), computed on
    # a small sub-batch to keep the host transfer bounded
    ref = np.asarray(var_a(feat[:2], wy[:2], wx[:2]), np.float32)
    for name, f in fns.items():
        out = np.asarray(f(feat[:2], wy[:2], wx[:2]), np.float32)
        maxd = np.abs(out - ref).max()
        jf = jax.jit(lambda fe, y, x, f=f: jnp.sum(f(fe, y, x)))
        _ = float(jf(feat, wy, wx))  # compile + warm
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            _ = float(jf(feat, wy, wx))
            ts.append(time.perf_counter() - t0)
        ms = 1000.0 * sorted(ts)[len(ts) // 2]
        print(f"  {name:<24s} {ms:8.2f} ms  (maxdiff vs A {maxd:.2e})",
              flush=True)


if __name__ == "__main__":
    main()
