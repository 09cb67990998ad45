"""Mosaic compile-check for the fused decode kernels at serving shapes.

The decode kernels landed while the axon tunnel was down, parity-tested in
interpret mode only — but Mosaic (the TPU Pallas compiler) rejects
patterns the interpreter accepts (e.g. the strided [B,H,Dh,1] cache store:
"unsupported shape cast"). This probe jit-lowers and compiles each kernel
for TPU (the axon compile helper is chipless-AOT, so this works even while
the chip is busy) and reports ok/fail per kernel, at the large-preset
decode shapes, bf16 and int8-weight variants.

Usage: python scripts/probe_kernelcompile.py
"""

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, H, DH, T, K, D, F = 64, 12, 64, 30, 257, 768, 3072


def _check(name, fn, *args, **kwargs):
    try:
        jax.jit(lambda *a: fn(*a, **kwargs)).lower(*args).compile()
        print(f"  {name:<42s} OK")
        return True
    except Exception as e:
        msg = str(e).split("\n")
        key = next((ln for ln in msg if "Mosaic" in ln or "INTERNAL" in ln),
                   msg[0])
        print(f"  {name:<42s} FAIL: {key[:120]}")
        if "-v" in sys.argv:
            traceback.print_exc()
        return False


def main():
    from embodied_captioning_tpu.ops.pallas.decode_attention import (
        decode_cross_attention, decode_cross_block, decode_mlp,
        decode_self_attention, decode_self_block,
    )

    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    rng = np.random.default_rng(0)

    def arr(*shape, dtype=jnp.bfloat16):
        return jnp.asarray(rng.standard_normal(shape), dtype)

    q = arr(B, H, DH)
    kt = arr(B, H, DH, T)
    v = arr(B, T, H, DH)
    pos = jnp.int32(7)
    ok = True
    ok &= _check("decode_self_attention", decode_self_attention,
                 q, kt, v, pos, block_b=8)

    ktx = arr(B, H, DH, K)
    vx = arr(B, H, K, DH)
    ok &= _check("decode_cross_attention bf16", decode_cross_attention,
                 q, ktx, vx, None, None, block_b=8)
    kt8 = jnp.asarray(rng.integers(-127, 127, (B, H, DH, K)), jnp.int8)
    v8 = jnp.asarray(rng.integers(-127, 127, (B, H, K, DH)), jnp.int8)
    ks = arr(B, H, K, dtype=jnp.float32)
    vs = arr(B, H, DH, dtype=jnp.float32)
    ok &= _check("decode_cross_attention int8", decode_cross_attention,
                 q, kt8, v8, ks, vs, block_b=8)

    x = arr(B, D)
    g = bvec = jnp.ones((D,), jnp.float32)
    sf = jnp.ones((F,), jnp.float32)
    sd = jnp.ones((D,), jnp.float32)
    ok &= _check("decode_mlp bf16", decode_mlp,
                 x, g, bvec, arr(D, F), sf, jnp.zeros((F,), jnp.float32),
                 arr(F, D), sd, jnp.zeros((D,), jnp.float32))
    w8a = jnp.asarray(rng.integers(-127, 127, (D, F)), jnp.int8)
    w8b = jnp.asarray(rng.integers(-127, 127, (F, D)), jnp.int8)
    ok &= _check("decode_mlp int8", decode_mlp,
                 x, g, bvec, w8a, sf, jnp.zeros((F,), jnp.float32),
                 w8b, sd, jnp.zeros((D,), jnp.float32))

    wdd = arr(D, D)
    bd = jnp.zeros((D,), jnp.float32)
    ok &= _check("decode_self_block bf16", decode_self_block,
                 x, g, bvec, wdd, sd, bd, wdd, sd, bd, wdd, sd, bd,
                 wdd, sd, bd, kt, v, pos, heads=H)
    w8 = jnp.asarray(rng.integers(-127, 127, (D, D)), jnp.int8)
    ok &= _check("decode_self_block int8", decode_self_block,
                 x, g, bvec, w8, sd, bd, w8, sd, bd, w8, sd, bd,
                 w8, sd, bd, kt, v, pos, heads=H)

    ok &= _check("decode_cross_block bf16", decode_cross_block,
                 x, g, bvec, wdd, sd, bd, wdd, sd, bd, ktx, vx,
                 heads=H, block_b=8)
    ok &= _check("decode_cross_block int8", decode_cross_block,
                 x, g, bvec, w8, sd, bd, w8, sd, bd, kt8, v8, ks, vs,
                 heads=H, block_b=8)
    print("ALL OK" if ok else "SOME FAILED")


if __name__ == "__main__":
    main()
