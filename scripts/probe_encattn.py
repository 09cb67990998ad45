#!/usr/bin/env python
"""Encoder self-attention probe at the ViT-L encode shape.

B=64 crops, H=16 heads, T=257 tokens, Dh=64 — the materialized XLA path
costs ~1.2 ms/layer on the large-preset trace; a good fused kernel should
be compute-bound (~0.3-0.4 ms/layer). Variants, all fenced by scalar
readback (this rig's block_until_ready does not fence):

  xla        the mha tail: bf16 scores, folded normalization (baseline)
  flash      ops.pallas.flash_attention as-is (bh_blk auto = 8)
  sbN        single-block rewrite: normalize AFTER PV ([T,64] divide, not
             [T,T]), bf16 probabilities, bh_blk = N
  sbN-bat    same but one batched dot_general over the bh block instead of
             a Python per-pair loop

Parity is checked against the f32 einsum reference (max |diff| printed).
"""

import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NEG_INF = -1e30


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl

    B, H, T, D, L = 64, 16, 257, 64, 24
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, T, D)) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, T, D)) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, T, D)) * 0.3, jnp.bfloat16)
    scale = 1.0 / math.sqrt(D)

    def ref_one(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                       k.astype(jnp.float32)) * scale
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))

    ref_out = np.asarray(jax.jit(ref_one)(q, k, v), np.float32)

    def xla_tail(q, k, v):
        # mirror of models/common.mha materialized tail
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
        logits = logits * scale
        m = jnp.max(logits, axis=-1, keepdims=True)
        pexp = jnp.exp(logits - m).astype(jnp.bfloat16)
        denom = jnp.sum(pexp.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", pexp, v,
                         preferred_element_type=jnp.float32)
        return out / denom[..., None]

    def make_sb(bh_blk: int, batched: bool):
        def kernel(q_ref, k_ref, v_ref, o_ref):
            if batched:
                s = jax.lax.dot_general(
                    q_ref[:], k_ref[:], (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32) * scale
                m = jnp.max(s, axis=2, keepdims=True)
                p = jnp.exp(s - m).astype(jnp.bfloat16)
                l = jnp.sum(p.astype(jnp.float32), axis=2)  # [bh, T]
                o = jax.lax.dot_general(
                    p, v_ref[:], (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                o_ref[:] = (o / l[:, :, None]).astype(o_ref.dtype)
            else:
                for i in range(q_ref.shape[0]):
                    s = jax.lax.dot_general(
                        q_ref[i], k_ref[i], (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32) * scale
                    m = jnp.max(s, axis=1, keepdims=True)
                    p = jnp.exp(s - m).astype(jnp.bfloat16)
                    l = jnp.sum(p.astype(jnp.float32), axis=1)  # [T]
                    o = jnp.dot(p, v_ref[i],
                                preferred_element_type=jnp.float32)
                    o_ref[i] = (o / l[:, None]).astype(o_ref.dtype)

        @jax.jit
        def run(q, k, v):
            b, h, t, d = q.shape
            qf = q.reshape(b * h, t, d)
            out = pl.pallas_call(
                kernel,
                grid=(b * h // bh_blk,),
                in_specs=[pl.BlockSpec((bh_blk, t, d), lambda i: (i, 0, 0))] * 3,
                out_specs=pl.BlockSpec((bh_blk, t, d), lambda i: (i, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((b * h, t, d), q.dtype),
            )(qf, k.reshape(b * h, t, d), v.reshape(b * h, t, d))
            return out.reshape(b, h, t, d)

        return run

    from embodied_captioning_tpu.ops.pallas.flash_attention import (
        flash_attention)

    candidates = [("xla", jax.jit(xla_tail)),
                  ("flash-asis", functools.partial(flash_attention))]
    for blk in (8, 16, 32):
        candidates.append((f"sb{blk}", make_sb(blk, False)))
        candidates.append((f"sb{blk}-bat", make_sb(blk, True)))

    def timed(name, fn):
        @jax.jit
        def looped(q, k, v):
            def body(c, _):
                o = fn(q, k, c)
                return o.astype(jnp.bfloat16), ()
            y, _ = jax.lax.scan(body, v, None, length=L)
            return jnp.sum(y.astype(jnp.float32))

        try:
            single = np.asarray(jax.jit(fn)(q, k, v), np.float32)
            err = float(np.max(np.abs(single - ref_out)))
            _ = float(looped(q, k, v))  # compile + warm
            ts = []
            for _i in range(5):
                t0 = time.perf_counter()
                _ = float(looped(q, k, v))
                ts.append(time.perf_counter() - t0)
            ms = 1000.0 * sorted(ts)[len(ts) // 2]
            print(f"  {name:<12s} {ms:7.1f} ms /{L} layers "
                  f"({ms / L * 1000:6.0f} us/layer)  maxdiff {err:.3e}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  {name:<12s} FAILED: {type(e).__name__}: {e}",
                  flush=True)

    print(f"devices: {jax.devices()}", flush=True)
    for name, fn in candidates:
        timed(name, fn)


if __name__ == "__main__":
    main()
