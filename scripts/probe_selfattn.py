#!/usr/bin/env python
"""Decode self-attention cache-layout probe.

The decode loop's self-attention ops read the K/V caches in full every
step. With caption_len=30 caches, the kt-form layout [B, H, Dh, T] pads
T=30 to 128 lanes — 12.6 MB physical per cache per layer-step (the trace
shows those ops at HBM speed: the layout, not the op, is the cost). This
probe times a 29-step x 12-layer decode-attention chain per layout:

  kt    k [B,H,Dh,T], v [B,T,H,Dh]   (current: MXU q.K, T in lanes)
  bhtd  k [B,H,T,Dh], v [B,H,T,Dh]   (T in sublanes: half the physical
                                      bytes, VPU lane-reduce contraction)
  bthd  k,v [B,T,H,Dh]               (round-1 form, for reference)

Fenced by scalar readback; parity (max|diff| vs kt) printed.
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    B, H, D, T, L, STEPS = 64, 12, 64, 32, 12, 29
    rng = np.random.default_rng(0)
    q0 = jnp.asarray(rng.standard_normal((B, H * D)) * 0.1, jnp.bfloat16)
    k_bhdt = jnp.asarray(rng.standard_normal((L, B, H, D, T)) * 0.1,
                         jnp.bfloat16)
    v_bthd = jnp.asarray(rng.standard_normal((L, B, T, H, D)) * 0.1,
                         jnp.bfloat16)
    k_bhtd = jnp.moveaxis(k_bhdt, 4, 3)          # [L, B, H, T, D]
    v_bhtd = jnp.moveaxis(v_bthd, 2, 3)          # [L, B, H, T, D]
    k_bthd = jnp.moveaxis(k_bhdt, (4, 2), (2, 3))  # [L, B, T, H, D]
    scale = 1.0 / math.sqrt(D)
    mask = (jnp.arange(T) < 30)[None, None, None, :]

    def softmax_pv_bhqk(s, pv):
        s = jnp.where(mask, s.astype(jnp.float32) * scale, -1e30)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m).astype(jnp.bfloat16)
        den = jnp.sum(p.astype(jnp.float32), axis=-1)
        return pv(p), den

    def run_kt(q0):
        def step(x, _):
            for i in range(L):
                q = x.reshape(B, 1, H, D)
                s = jnp.einsum("bqhd,bhdk->bhqk", q, k_bhdt[i])
                o, den = softmax_pv_bhqk(
                    s, lambda p: jnp.einsum("bhqk,bkhd->bqhd", p, v_bthd[i],
                                            preferred_element_type=jnp.float32))
                o = o / jnp.moveaxis(den, 1, 2)[..., None]
                x = x + o.reshape(B, H * D).astype(jnp.bfloat16)
            return x, ()
        y, _ = jax.lax.scan(step, q0, None, length=STEPS)
        return jnp.sum(y.astype(jnp.float32))

    def run_bhtd(q0):
        def step(x, _):
            for i in range(L):
                q = x.reshape(B, 1, H, D)
                s = jnp.einsum("bqhd,bhkd->bhqk", q, k_bhtd[i])
                o, den = softmax_pv_bhqk(
                    s, lambda p: jnp.einsum("bhqk,bhkd->bqhd", p, v_bhtd[i],
                                            preferred_element_type=jnp.float32))
                o = o / jnp.moveaxis(den, 1, 2)[..., None]
                x = x + o.reshape(B, H * D).astype(jnp.bfloat16)
            return x, ()
        y, _ = jax.lax.scan(step, q0, None, length=STEPS)
        return jnp.sum(y.astype(jnp.float32))

    def run_bthd(q0):
        def step(x, _):
            for i in range(L):
                q = x.reshape(B, 1, H, D)
                s = jnp.einsum("bqhd,bkhd->bhqk", q, k_bthd[i])
                o, den = softmax_pv_bhqk(
                    s, lambda p: jnp.einsum("bhqk,bkhd->bqhd", p, v_bthd[i],
                                            preferred_element_type=jnp.float32))
                o = o / jnp.moveaxis(den, 1, 2)[..., None]
                x = x + o.reshape(B, H * D).astype(jnp.bfloat16)
            return x, ()
        y, _ = jax.lax.scan(step, q0, None, length=STEPS)
        return jnp.sum(y.astype(jnp.float32))

    ref = None
    for name, fn in [("kt", run_kt), ("bhtd", run_bhtd), ("bthd", run_bthd)]:
        jf = jax.jit(fn)
        val = float(jf(q0))
        if ref is None:
            ref, err = val, 0.0
        else:
            err = abs(val - ref) / max(abs(ref), 1.0)
        ts = []
        for _i in range(5):
            t0 = time.perf_counter()
            _ = float(jf(q0))
            ts.append(time.perf_counter() - t0)
        ms = 1000.0 * sorted(ts)[len(ts) // 2]
        print(f"  {name:<6s} {ms:7.1f} ms /{STEPS}x{L}   reldiff {err:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
