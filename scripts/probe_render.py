#!/usr/bin/env python
"""Probe: RaycastSim render cost at the loop workload (1280^2, 16 envs).

The round-3 loop bench measured 9.52 fps with the sim in the loop vs
77.17 pure perception — the 1280^2 render cost ~7x a perception step on
the shared chip. CONFIRMED: the five per-pixel attribute gathers
(albedo[best], box_min[best], ...) hit the elementwise-gather slow path
(ops/image.py measured 17x there): onehot measured 10x over gather
(1173 -> 117 ms/16-frame batch), loop 9.52 -> 50.8-55.4 fps. Arms (all
bit-exact, tests/test_agents.py):

  gather     the indexed form (round<=2 default)
  onehot     {0,1}[H,W,Bx] @ [Bx,11] attribute table on the MXU (DEFAULT)
  onehot16   bf16 one-hot storage (parity — XLA fuses the one-hot anyway)
  onehot+vr  variadic (min,argmin) lax.reduce (parity — same materialized
             producers feed the reduce fusion; see --trace)
  onehot+pk  Pallas VMEM-fused visibility kernel, ops/pallas/raycast.py
             (parity-to-noise on v5e: VPU-serial chain ~= roofline
             materialization; documented negative, stays opt-in)

All run through render_batch_chunked at the exact loop shapes, fenced by
scalar-checksum readback (tunnel: block_until_ready does not fence).
Arms are interleaved round-robin: tunnel throughput drifts across minutes
(same arm 113->200 ms in back-to-back runs), so only in-run comparisons
count.

Usage: python scripts/probe_render.py [--envs 16 --size 1280 --iters 6]
       python scripts/probe_render.py --modes onehot,onehot+pk
       python scripts/probe_render.py --trace onehot   # per-op table
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=16)
    ap.add_argument("--size", type=int, default=1280)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--modes", default=None,
                    help="comma-separated subset of arms to time")
    ap.add_argument("--trace", metavar="MODE",
                    help="device-trace one batch of MODE and print the "
                         "per-op table (reuses profile_ops.report)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from embodied_captioning_tpu.config import SimConfig
    from embodied_captioning_tpu.envs.sim import (
        generate_scene, render_batch_chunked,
    )

    n, hw = args.envs, args.size
    scenes = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[generate_scene(SimConfig(), seed=i) for i in range(n)])
    rng = np.random.default_rng(0)
    poses = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    poses[:, 0, 3] = rng.uniform(-3, 3, n)
    poses[:, 2, 3] = rng.uniform(-3, 3, n)
    poses[:, 1, 3] = 0.88
    poses = jnp.asarray(poses)

    def fenced(mode):
        def run():
            out = render_batch_chunked(scenes, poses, hw, hw, 79.0, 15.0,
                                       attr_mode=mode)
            cs = (jnp.sum(out["depth"]) + jnp.sum(out["rgb"].astype(
                jnp.float32)) + jnp.sum(out["instances"]))
            return float(cs)   # host readback fences

        return run

    # onehot@TxK = tile-culled (T-px tiles, K candidate boxes per tile):
    # the only arm that REDUCES slab-test traffic (H*W*K vs H*W*Bx)
    # rather than respelling it; bit-exact unless a tile overflows K
    # (parity assert below catches that on these scenes)
    modes = ("gather", "onehot", "onehot16", "onehot+vr", "onehot+pk",
             "onehot@160x48", "onehot@160x64")
    if args.modes:
        modes = ("gather",) + tuple(
            m for m in args.modes.split(",") if m != "gather")

    # parity at small size first (cheap compile); culled arms shrink the
    # tile to divide 128 (candidate logic identical, just more tiles)
    import re

    small = {}
    for mode in modes:
        small_mode = re.sub(r"@\d+x", "@32x", mode)
        small[mode] = render_batch_chunked(scenes, poses, 128, 128, 79.0,
                                           15.0, attr_mode=small_mode)
    for k in ("rgb", "depth", "instances", "classes"):
        a = np.asarray(small["gather"][k]).astype(np.float32)
        for m in modes[1:]:
            b = np.asarray(small[m][k]).astype(np.float32)
            assert np.abs(a - b).max() == 0.0, f"parity break on {k} ({m})"
    print(f"  parity at 128^2: exact on rgb/depth/instances/classes",
          flush=True)

    # culled arms: report max per-tile candidate overflow at the TIMING
    # resolution (exactness certificate — overflow 0 means bit-exact there
    # too, not just at the 128^2 parity check)
    from embodied_captioning_tpu.envs.sim import _parse_cull, _tile_candidates
    from embodied_captioning_tpu.ops.geometry import intrinsics_from_hfov

    for mode in modes:
        _, tile, k = _parse_cull(mode)
        if not tile:
            continue
        fx, fy, xc, yc = intrinsics_from_hfov(hw, hw, 79.0)
        ovf = max(
            int(_tile_candidates(
                jax.tree_util.tree_map(lambda x: x[i], scenes),
                poses[i, :3, 3], poses[i, :3, :3], fx, fy, xc, yc,
                hw, hw, tile, k)[2])
            for i in range(n))
        print(f"  {mode}: max per-tile candidate overflow at {hw}^2 = {ovf}"
              f" ({'bit-exact' if ovf == 0 else 'INEXACT on these scenes'})",
              flush=True)

    if args.trace:
        import tempfile
        from profile_ops import report
        run = fenced(args.trace)
        _ = run()   # compile + warm
        trace_dir = tempfile.mkdtemp(prefix="ecap_render_trace_")
        jax.profiler.start_trace(trace_dir)
        _ = run()
        jax.profiler.stop_trace()
        report(trace_dir, 25)
        return

    # interleave arms round-robin: chip/tunnel throughput drifts across
    # minutes (observed 113->200 ms for the SAME arm in back-to-back
    # runs), so sequential per-arm timing confounds arm with drift
    runs = {m: fenced(m) for m in modes}
    for m in modes:
        _ = runs[m]()   # compile + warm
    ts = {m: [] for m in modes}
    for _ in range(args.iters):
        for m in modes:
            t0 = time.perf_counter()
            _ = runs[m]()
            ts[m].append(time.perf_counter() - t0)
    for m in modes:
        ms = 1000.0 * sorted(ts[m])[len(ts[m]) // 2]
        print(f"  {m:<9s} {ms:8.1f} ms/batch  "
              f"({1000.0 * n / ms:6.1f} frames/s)", flush=True)


if __name__ == "__main__":
    main()
