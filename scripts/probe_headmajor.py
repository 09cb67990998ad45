#!/usr/bin/env python
"""Probe: head-major QKV projection spelling for the encoder self-attention.

The round-3 device trace shows 69 (= 23 layers x Q/K/V) layout copies
bf16[64,257,1024]{2,1,0} -> {1,2,0} at 77 us each (5.3 ms/batch) plus 24
copies in the mm tower: XLA relayouts each projection output before the
head-batched scores/PV matmuls. Hypothesis: projecting DIRECTLY to
head-major [B, H, T, Dh] via a 3D-reshaped weight einsum lets XLA emit the
matmul in the layout the attention einsums want, deleting the copies.

Variants (same weights, parity-checked):
  A: current `mha` path ([B,T,D] dense -> split_heads -> bhqk einsums)
  B: head-major einsum projections, scores "bhqm,bhkm->bhqk",
     PV "bhqk,bhkm->bhqm", out-proj "bhqm,hmd->bqd"

Usage: python scripts/probe_headmajor.py [--layers 24] [--iters 20]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=24)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--tokens", type=int, default=257)
    ap.add_argument("--dim", type=int, default=1024)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from embodied_captioning_tpu.models import common as C

    b, t, d, h = args.batch, args.tokens, args.dim, args.heads
    dh = d // h
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, args.layers + 1)
    layers = [C.block_init(ks[i], d, h) for i in range(args.layers)]
    x0 = jax.random.normal(ks[-1], (b, t, d), jnp.float32).astype(jnp.bfloat16)

    def run_a(layers, x):
        for p in layers:
            x, _ = C.block(p, x, h)
        return x

    import math

    def mha_headmajor(p, x):
        cd = jnp.bfloat16
        xc = x.astype(cd)
        w3 = {n: p[n]["w"].astype(cd).reshape(d, h, dh) for n in "qkv"}
        b3 = {n: p[n]["b"].astype(jnp.float32).reshape(h, 1, dh)
              for n in "qkv"}
        q = (jnp.einsum("btd,dhm->bhtm", xc, w3["q"],
                        preferred_element_type=jnp.float32)
             + b3["q"]).astype(cd)
        k = (jnp.einsum("btd,dhm->bhtm", xc, w3["k"],
                        preferred_element_type=jnp.float32)
             + b3["k"]).astype(cd)
        v = (jnp.einsum("btd,dhm->bhtm", xc, w3["v"],
                        preferred_element_type=jnp.float32)
             + b3["v"]).astype(cd)
        logits = jnp.einsum("bhqm,bhkm->bhqk", q, k).astype(jnp.float32)
        logits = logits / math.sqrt(dh)
        m = jnp.max(logits, axis=-1, keepdims=True)
        pexp = jnp.exp(logits - m).astype(cd)
        denom = jnp.sum(pexp.astype(jnp.float32), axis=-1)  # [B,H,Q]
        out = jnp.einsum("bhqk,bhkm->bhqm", pexp, v,
                         preferred_element_type=jnp.float32)
        out = out / denom[..., None]
        wo = p["o"]["w"].astype(cd).reshape(h, dh, d)
        y = (jnp.einsum("bhqm,hmd->bqd", out.astype(cd), wo,
                        preferred_element_type=jnp.float32)
             + p["o"]["b"]).astype(cd)
        return y

    def run_b(layers, x):
        for p in layers:
            a = mha_headmajor(p["attn"], C.layernorm(p["ln1"], x))
            x = x + a
            x = x + C.mlp(p["mlp"], C.layernorm(p["ln2"], x))
        return x

    fa = jax.jit(lambda ls, x: jnp.sum(run_a(ls, x).astype(jnp.float32)))
    fb = jax.jit(lambda ls, x: jnp.sum(run_b(ls, x).astype(jnp.float32)))

    # variant A must measure the LEGACY spelling: since this probe landed,
    # mha defaults to the head-major path, so trace A with the env override
    # (the jit cache pins the traced program for the timing loop below)
    os.environ["ECAP_HEADMAJOR"] = "0"
    ya = float(fa(layers, x0))
    os.environ["ECAP_HEADMAJOR"] = "1"
    yb = float(fb(layers, x0))
    rel = abs(ya - yb) / max(abs(ya), 1e-6)
    print(f"parity: sumA={ya:.4f} sumB={yb:.4f} rel={rel:.2e}")

    for name, f in (("A current", fa), ("B headmajor", fb)):
        t0 = time.perf_counter()
        acc = 0.0
        for _ in range(args.iters):
            acc += float(f(layers, x0))
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name}: {dt * 1000:.2f} ms/iter  ({acc:.1f})")


if __name__ == "__main__":
    main()
