#!/usr/bin/env python
"""Capture a device trace of the fused perception program and print a
per-op cost table (the workflow that found every round-2 hot spot).

jax.profiler works through the axon tunnel; the XLA-op lane of the
exported trace.json.gz carries per-op durations, HLO categories, shapes
and bytes_accessed. This CLI warms the program, traces ONE step, then
aggregates ops by deduplicated computation and prints the top-N with
achieved bandwidth — enough to attribute every millisecond without
tensorboard.

Usage:
  python scripts/profile_ops.py                 # large preset, batch 16
  BENCH_PRESET=base python scripts/profile_ops.py --top 30
  python scripts/profile_ops.py --trace-dir /tmp/my_trace  # keep the trace
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(trace_dir: str, preset: str, batch: int, slots: int,
            int8: bool) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from embodied_captioning_tpu.config import load_config
    from embodied_captioning_tpu.perception import init_perception, perceive

    cfg = load_config(
        preset, overrides=[f"runtime.caption_slots_per_frame={slots}",
                   "runtime.caption_invalid_slots=true"])
    params = init_perception(jax.random.PRNGKey(0), cfg)
    if int8:
        from embodied_captioning_tpu.models.quantize import quantize_params

        params = quantize_params(params)
    size = cfg.sensors.height  # perceive takes sensor-resolution frames
    images = jnp.asarray((np.random.default_rng(0).random(
        (batch, size, size, 3)) * 255).astype(np.uint8))
    key = jax.random.PRNGKey(1)

    @jax.jit
    def step(params, images, key):
        r = perceive(params, images, key, cfg)
        return (jnp.sum(r.detections.boxes) + jnp.sum(r.caption_tokens)
                + jnp.sum(r.detections.embeddings))

    _ = float(step(params, images, key))  # compile + warm (fenced)
    jax.profiler.start_trace(trace_dir)
    _ = float(step(params, images, key))
    jax.profiler.stop_trace()


def report(trace_dir: str, top: int) -> None:
    paths = glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise SystemExit(f"no trace.json.gz under {trace_dir}")
    with gzip.open(sorted(paths)[-1]) as f:
        d = json.load(f)
    ev = d["traceEvents"]
    # find the XLA-op thread of the device process
    tids = {}
    dev_pid = None
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            if "TPU" in str(e.get("args", {}).get("name", "")):
                dev_pid = e["pid"]
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e["pid"], e["tid"])] = e["args"]["name"]
    op_tid = next((t for (p, t), n in tids.items()
                   if p == dev_pid and n == "XLA Ops"), None)
    if dev_pid is None or op_tid is None:
        raise SystemExit(
            f"no TPU 'XLA Ops' lane in the trace (processes: "
            f"{sorted(set(tids.values()))}) — was the program run on the "
            f"device? (ECAP_PLATFORM=cpu produces no device lane)")
    rec = {}
    total = 0
    for e in ev:
        if (e.get("ph") == "X" and e.get("pid") == dev_pid
                and e.get("tid") == op_tid):
            n = e["name"]
            a = e.get("args", {})
            if n.startswith(("jit_", "while")):
                continue
            c = a.get("deduplicated_name") or n
            r = rec.setdefault(c, dict(t=0, c=0, a=a))
            r["t"] += e.get("dur", 0)
            r["c"] += 1
            total += e.get("dur", 0)
    print(f"device op time: {total / 1e3:.1f} ms "
          f"({len(rec)} distinct computations)")
    print(f"{'total_ms':>9} {'count':>6} {'per_op_us':>9} {'GB/s':>6}  "
          f"category / shape")
    rows = sorted(((r["t"], c, r) for c, r in rec.items()), reverse=True)
    for t, c, r in rows[:top]:
        a = r["a"]
        per = t / r["c"]
        ba = int(a.get("bytes_accessed", 0))
        bw = ba / (per * 1e-6) / 1e9 if per > 0 and ba else 0
        ln = a.get("long_name", "")
        shape = ln.split("=")[1].strip()[:58] if "=" in ln else c[:58]
        cat = a.get("hlo_category", "?")
        print(f"{t / 1e3:9.2f} {r['c']:6d} {per:9.1f} {bw:6.0f}  "
              f"[{cat[:18]}] {shape}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default=os.environ.get("BENCH_PRESET",
                                                       "large"))
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--slots", type=int, default=4)
    ap.add_argument("--no-int8", action="store_true")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--trace-dir", default=None,
                    help="keep the raw trace here (default: temp dir)")
    ap.add_argument("--report-only", metavar="DIR",
                    help="skip capture; analyze an existing trace dir")
    args = ap.parse_args()

    if args.report_only:
        report(args.report_only, args.top)
        return
    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="ecap_trace_")
    capture(trace_dir, args.preset, args.batch, args.slots,
            not args.no_int8)
    report(trace_dir, args.top)
    if args.trace_dir is None:
        print(f"(trace kept at {trace_dir})")


if __name__ == "__main__":
    main()
