#!/usr/bin/env python
"""Cross-attention layout probe: 29-step scan x 12 layers of single-query
cross-attention over 256 precomputed KV tokens (the decode-dominant op).

Layouts:
  A  [B, K, H, D] kv + einsum bqhd,bkhd->bhqk   (current mha path)
  B  [B, H, K, D] kv + einsum bhqd,bhkd->bhqk   (head-major, no transposes)
  C  B + fused scale into q, softmax in bf16->f32 minimal
Fenced by scalar readback.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    B, K, H, D, L, STEPS = 64, 256, 12, 64, 12, 29
    rng = np.random.default_rng(0)
    q_w = jnp.asarray(rng.standard_normal((L, H * D, H * D)) * 0.03,
                      jnp.bfloat16)
    o_w = jnp.asarray(rng.standard_normal((L, H * D, H * D)) * 0.03,
                      jnp.bfloat16)
    kv_a = jnp.asarray(rng.standard_normal((L, 2, B, K, H, D)), jnp.bfloat16)
    kv_b = jnp.moveaxis(kv_a, 4, 3)  # [L, 2, B, H, K, D]
    x0 = jnp.asarray(rng.standard_normal((B, H * D)), jnp.bfloat16)

    def timed(name, fn, *args, reps=3):
        jfn = jax.jit(fn)
        _ = float(jfn(*args))
        ts = []
        for _i in range(reps):
            t0 = time.perf_counter()
            _ = float(jfn(*args))
            ts.append(time.perf_counter() - t0)
        ms = 1000.0 * sorted(ts)[len(ts) // 2]
        print(f"  {name:<34s} {ms:7.1f} ms", flush=True)
        return ms

    scale = 1.0 / np.sqrt(D)

    def run_a(q_w, o_w, kv):
        def step(x, _):
            for i in range(L):
                q = (x @ q_w[i]).reshape(B, 1, H, D)
                k, v = kv[i, 0], kv[i, 1]            # [B, K, H, D]
                s = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
                w = jax.nn.softmax(s * scale, axis=-1).astype(jnp.bfloat16)
                o = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(B, H * D)
                x = x + o @ o_w[i]
            return x, ()

        y, _ = jax.lax.scan(step, x0, None, length=STEPS)
        return jnp.sum(y.astype(jnp.float32))

    def run_b(q_w, o_w, kv):
        def step(x, _):
            for i in range(L):
                q = (x @ q_w[i]).reshape(B, H, 1, D)
                k, v = kv[i, 0], kv[i, 1]            # [B, H, K, D]
                s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
                w = jax.nn.softmax(s * scale, axis=-1).astype(jnp.bfloat16)
                o = jnp.einsum("bhqk,bhkd->bhqd", w, v).reshape(B, H * D)
                x = x + o @ o_w[i]
            return x, ()

        y, _ = jax.lax.scan(step, x0, None, length=STEPS)
        return jnp.sum(y.astype(jnp.float32))

    def run_c(q_w, o_w, kv):
        # head-major + flat [B*H] batch dims for dot_general friendliness
        def step(x, _):
            for i in range(L):
                q = (x @ (q_w[i] * scale)).reshape(B * H, 1, D)
                k = kv[i, 0].reshape(B * H, K, D)
                v = kv[i, 1].reshape(B * H, K, D)
                s = jax.lax.dot_general(
                    q, k, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)   # [BH, 1, K]
                w = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
                o = jax.lax.dot_general(
                    w, v, (((2,), (1,)), ((0,), (0,))))   # [BH, 1, D]
                x = x + o.reshape(B, H * D) @ o_w[i]
            return x, ()

        y, _ = jax.lax.scan(step, x0, None, length=STEPS)
        return jnp.sum(y.astype(jnp.float32))

    print(f"[xattn probe] B={B} K={K} H={H} D={D} L={L} steps={STEPS} "
          f"(fence ~24 ms included)", flush=True)
    timed("fence", lambda z: jnp.sum(z), jnp.ones((8,)))
    timed("A  [B,K,H,D] (current)", run_a, q_w, o_w, kv_a)
    timed("B  [B,H,K,D] head-major", run_b, q_w, o_w, kv_b)
    timed("C  [B*H,K,D] flat dot_general", run_c, q_w, o_w, kv_b)


if __name__ == "__main__":
    main()
