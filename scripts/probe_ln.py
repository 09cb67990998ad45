#!/usr/bin/env python
"""LayerNorm microbenchmark at the ViT-L hot shape.

The fused perceive trace shows each ViT block's LN costing ~1.58 ms
(bf16[64,257,1024] -> (f32 stats, bf16 out)) = ~42 GB/s effective — far
below HBM. Variants probe why and what to do:
  A  current layernorm (mean/var two-stage, f32 internal)
  B  one-pass E[x]/E[x2] stats (var = m2 - m1^2)
  C  B with stats computed from bf16 input without f32 conversion first
Each run chains 24 LNs with a residual add (mimicking the encoder loop
structure so XLA sees the same producer/consumer pattern). Fenced.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from embodied_captioning_tpu.models.common import layernorm

    B, T, D, L = 64, 257, 1024, 24
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((B, T, D)), jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal((L, D)).astype(np.float32))
    bb = jnp.asarray(rng.standard_normal((L, D)).astype(np.float32))

    def timed(name, fn, *args, reps=3):
        jfn = jax.jit(fn)
        _ = float(jfn(*args))
        ts = []
        for _i in range(reps):
            t0 = time.perf_counter()
            _ = float(jfn(*args))
            ts.append(time.perf_counter() - t0)
        ms = 1000.0 * sorted(ts)[len(ts) // 2]
        print(f"  {name:<42s} {ms:7.1f} ms", flush=True)
        return ms

    def chain(ln_fn):
        def run(x):
            for i in range(L):
                y = ln_fn(x, g[i], bb[i])
                x = x + y * jnp.bfloat16(0.125)  # residual-style consumer
            return jnp.sum(x.astype(jnp.float32))
        return run

    def ln_current(x, gi, bi):
        return layernorm({"g": gi, "b": bi}, x)

    def ln_onepass(x, gi, bi, eps=1e-5):
        xf = x.astype(jnp.float32)
        m1 = jnp.mean(xf, axis=-1, keepdims=True)
        m2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
        var = m2 - m1 * m1
        return ((xf - m1) * jax.lax.rsqrt(var + eps) * gi + bi
                ).astype(x.dtype)

    def ln_bf16stats(x, gi, bi, eps=1e-5):
        m1 = jnp.mean(x, axis=-1, keepdims=True).astype(jnp.float32)
        m2 = jnp.mean(x * x, axis=-1, keepdims=True).astype(jnp.float32)
        var = m2 - m1 * m1
        inv = jax.lax.rsqrt(var + eps)
        return ((x.astype(jnp.float32) - m1) * inv * gi + bi).astype(x.dtype)

    print(f"[ln probe] {L} chained LNs on bf16[{B},{T},{D}] "
          f"(fence ~24 ms included)", flush=True)
    timed("fence", lambda z: jnp.sum(z), jnp.ones((8,)))
    timed("A  current (mean/var sequential)", chain(ln_current), x0)
    timed("B  one-pass E[x],E[x^2] f32", chain(ln_onepass), x0)
    timed("C  bf16-input stats", chain(ln_bf16stats), x0)


if __name__ == "__main__":
    main()
