#!/usr/bin/env python
"""ROI-align formulation probe at the detector's serving shapes.

The large-preset trace shows the box-head ROI-align chain costs ~13 ms of
the 235 ms batch: the [F=16, N=128, S=14, W=128, C=256] row-interpolation
intermediate (1.9 GB bf16) is written, layout-copied (5.76 ms!), and
re-read. Variants probed (all fenced by scalar readback):

  A  current: rows = nsh,hk; out = ntw,nswc->nstc
  B  out = ntw,nswc->ntsc (+ small transpose) — moves any layout mismatch
     to the 25x-smaller output
  C  cols-first: tmp = ntw over [H,W,C]; out = nsh,nhtc->nstc
  D  B with rows cast to bf16 explicitly
Parity vs A is printed (max |diff|).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    F, H, W, C, N, OUT, SR = 16, 128, 128, 256, 128, 7, 2
    S = OUT * SR
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.standard_normal((F, H, W, C)) * 0.1, jnp.bfloat16)
    # random valid boxes in feature coords
    cx = rng.uniform(8, W - 8, (F, N))
    cy = rng.uniform(8, H - 8, (F, N))
    bw = rng.uniform(4, 60, (F, N))
    bh = rng.uniform(4, 60, (F, N))
    boxes = jnp.asarray(np.stack(
        [cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], -1), jnp.float32)

    from embodied_captioning_tpu.ops.image import _interp_weights

    def weights(bxs):
        x1, y1, x2, y2 = bxs[:, 0], bxs[:, 1], bxs[:, 2], bxs[:, 3]
        bw = jnp.maximum(x2 - x1, 1e-3)
        bh = jnp.maximum(y2 - y1, 1e-3)
        u = (jnp.arange(S, dtype=jnp.float32) + 0.5) / S
        sx = jnp.clip(x1[:, None] + u[None] * bw[:, None] - 0.5, 0, W - 1.0)
        sy = jnp.clip(y1[:, None] + u[None] * bh[:, None] - 0.5, 0, H - 1.0)
        wy = jax.vmap(lambda s: _interp_weights(s, H))(sy)
        wx = jax.vmap(lambda s: _interp_weights(s, W))(sx)
        return wy, wx

    def pool(fine):  # [N, S, S, C] -> [N, OUT, OUT, C]
        n = fine.shape[0]
        fine = fine.reshape(n, OUT, SR, OUT, SR, C)
        return fine.mean(axis=(2, 4))

    def var_a(feat1, bxs):
        wy, wx = weights(bxs)
        imgf = feat1.astype(jnp.float32).reshape(H, W * C)
        rows = jnp.einsum("nsh,hk->nsk", wy, imgf,
                          preferred_element_type=jnp.float32)
        rows = rows.reshape(-1, S, W, C)
        out = jnp.einsum("ntw,nswc->nstc", wx, rows,
                         preferred_element_type=jnp.float32)
        return pool(out)

    def var_b(feat1, bxs):
        wy, wx = weights(bxs)
        imgf = feat1.astype(jnp.float32).reshape(H, W * C)
        rows = jnp.einsum("nsh,hk->nsk", wy, imgf,
                          preferred_element_type=jnp.float32)
        rows = rows.reshape(-1, S, W, C)
        out = jnp.einsum("ntw,nswc->ntsc", wx, rows,
                         preferred_element_type=jnp.float32)
        return pool(jnp.swapaxes(out, 1, 2))

    def var_c(feat1, bxs):
        wy, wx = weights(bxs)
        tmp = jnp.einsum("ntw,hwc->nhtc", wx, feat1.astype(jnp.float32),
                         preferred_element_type=jnp.float32)
        out = jnp.einsum("nsh,nhtc->nstc", wy, tmp,
                         preferred_element_type=jnp.float32)
        return pool(out)

    def var_d(feat1, bxs):
        wy, wx = weights(bxs)
        imgf = feat1.reshape(H, W * C)
        rows = jnp.einsum("nsh,hk->nsk", wy.astype(jnp.bfloat16), imgf,
                          preferred_element_type=jnp.bfloat16)
        rows = rows.reshape(-1, S, W, C)
        out = jnp.einsum("ntw,nswc->ntsc", wx.astype(jnp.bfloat16), rows,
                         preferred_element_type=jnp.float32)
        return pool(jnp.swapaxes(out, 1, 2))

    variants = [("A-current", var_a), ("B-ntsc", var_b),
                ("C-colsfirst", var_c), ("D-bf16", var_d)]

    ref = None
    for name, fn in variants:
        batched = jax.jit(jax.vmap(fn))

        def fenced(feat, boxes, fn=batched):
            return jnp.sum(fn(feat, boxes).astype(jnp.float32))

        jf = jax.jit(fenced)
        try:
            outv = np.asarray(jax.vmap(fn)(feat, boxes), np.float32) \
                if ref is None else None
            if ref is None:
                ref = outv
                err = 0.0
            else:
                err = float(np.max(np.abs(
                    np.asarray(jax.jit(jax.vmap(fn))(feat, boxes),
                               np.float32) - ref)))
            _ = float(jf(feat, boxes))
            ts = []
            for _i in range(5):
                t0 = time.perf_counter()
                _ = float(jf(feat, boxes))
                ts.append(time.perf_counter() - t0)
            ms = 1000.0 * sorted(ts)[len(ts) // 2]
            print(f"  {name:<14s} {ms:7.2f} ms   maxdiff {err:.3e}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  {name:<14s} FAILED: {type(e).__name__}: {e}",
                  flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
