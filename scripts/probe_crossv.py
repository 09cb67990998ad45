#!/usr/bin/env python
"""Probe: cross-attention V layout in the decode loop.

The round-3 trace shows the cross-attn PV (int8 V [64,256,12,64] x pexp)
running at 275 GB/s / 35-46 us per layer-step (12.3 ms/batch total) while
the symmetric q.K score op with pre-transposed K hits 620 GB/s — V's
[B,K,H,Dh] layout forces strided per-head reads. Variants, decode-shaped
(B=64 rows, H=12, K=256 pooled tokens, Dh=64, int8 V with bf16 dequant
fused into the einsum):

  A current:    V [B,K,H,Dh],  out = einsum("bhqk,bkhd->bqhd")
  B head-major: V [B,H,K,Dh],  out = einsum("bhqk,bhkd->bhqd")
  C Dh-major:   V [B,H,Dh,K],  out = einsum("bhqk,bhdk->bhqd")

Each runs a 29-step scan re-reading all 12 layers' V every step (the
decode access pattern), fenced by readback.

Usage: python scripts/probe_crossv.py [--iters 10]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--klen", type=int, default=256)
    ap.add_argument("--dh", type=int, default=64)
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--steps", type=int, default=29)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import embodied_captioning_tpu  # noqa: F401  (honors ECAP_PLATFORM)
    import jax
    import jax.numpy as jnp
    import numpy as np

    b, h, k, d = args.batch, args.heads, args.klen, args.dh
    ll, steps = args.layers, args.steps
    rng = np.random.default_rng(0)
    # canonical data in layout A; B/C are transposes of the same values
    v_a = jnp.asarray(rng.integers(-127, 127, (ll, b, k, h, d)
                                   ).astype(np.int8))
    s_a = jnp.asarray((rng.random((ll, b, h, d)) * 0.02).astype(np.float32))
    pexp = jnp.asarray(rng.random((b, h, 1, k)).astype(np.float32)
                       ).astype(jnp.bfloat16)

    def make_runner(pv_fn):
        """29-step scan, each step contracts pexp with every layer's V."""
        def run(vs, sc):
            def step(acc, _):
                for li in range(ll):
                    acc = acc + pv_fn(vs[li], sc[li])
                return acc, None

            out, _ = jax.lax.scan(step, jnp.zeros((b, h, d), jnp.float32),
                                  None, length=steps)
            return jnp.sum(out)

        return jax.jit(run)

    def bench(name, pv_fn, vs, sc, ref=None):
        jf = make_runner(pv_fn)
        val = float(jf(vs, sc))
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            _ = float(jf(vs, sc))
            ts.append(time.perf_counter() - t0)
        ms = 1000.0 * sorted(ts)[len(ts) // 2]
        traffic = ll * steps * b * k * h * d / 1e9  # int8 GB per call
        line = f"  {name:<24s} {ms:8.2f} ms  (~{traffic / (ms/1e3):.0f} GB/s V)"
        if ref is not None:
            line += f"  rel vs A {abs(val - ref) / max(abs(ref), 1e-6):.2e}"
        print(line, flush=True)
        return val

    # A: V [B,K,H,Dh], scale [B,H,Dh]
    va = bench(
        "A [B,K,H,Dh] (current)",
        lambda v, s: jnp.einsum("bhqk,bkhd->bqhd", pexp,
                                v.astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32
                                )[:, 0] * s,
        v_a, s_a)
    # B: V [B,H,K,Dh]
    bench(
        "B [B,H,K,Dh]",
        lambda v, s: jnp.einsum("bhqk,bhkd->bhqd", pexp,
                                v.astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32
                                )[:, :, 0] * s,
        jnp.transpose(v_a, (0, 1, 3, 2, 4)), s_a, ref=va)
    # C: V [B,H,Dh,K]
    bench(
        "C [B,H,Dh,K]",
        lambda v, s: jnp.einsum("bhqk,bhdk->bhqd", pexp,
                                v.astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32
                                )[:, :, 0] * s,
        jnp.transpose(v_a, (0, 1, 3, 4, 2)), s_a, ref=va)


if __name__ == "__main__":
    main()
