"""Pallas ray-AABB visibility kernel (TPU).

Why: at the loop workload (16 envs x 1280^2, 96 boxes/scene) the XLA
spelling of the slab test + min/argmin materializes the [H, W, Bx] f32
hit-distance tensor in HBM — twice, because XLA duplicates the producer
fusion to feed min and argmin separately — moving ~30 GB/batch at the
753 GB/s roofline (54 of the 74 ms render device time; see
scripts/probe_render.py --trace and docs/BENCH.md). A variadic
(min, argmin) lax.reduce does NOT change the structure (probed: XLA still
feeds the reduce fusion from materialized producers).

This kernel computes the slab test for every box and folds it into a
running (t_best, best) pair entirely in VMEM/registers: HBM traffic drops
to the [H, W] ray components in and the two [H, W] outputs — ~65 MB/env
instead of ~1.9 GB. The box loop is unrolled with STATIC indices (Bx is
fixed per scene struct), so Mosaic sees pure scalar-broadcast vector ops
and no dynamic VMEM indexing.

Exactness: boxes are folded in index order with a strict `t < t_best`
update, which reproduces jnp.argmin's first-lowest-index tie-breaking
bit-exactly (min over f32 is exact; the slab arithmetic is the same
expression tree as the XLA path, with (box - origin) hoisted — see
envs/sim.render, which hoists the same way for both paths).

ref workload: experimenting_env habitat rendering is host-side C++
(habitat-sim); this kernel is the TPU-native answer for the on-device
simulator's visibility pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _raycast_kernel(nb: int, ax_ref, ay_ref, az_ref, bx_ref, by_ref,
                    bz_ref, vf_ref, ix_ref, iy_ref, iz_ref,
                    tb_ref, bi_ref):
    invx = ix_ref[...]
    invy = iy_ref[...]
    invz = iz_ref[...]
    t_best = jnp.full(invx.shape, jnp.inf, jnp.float32)
    best = jnp.zeros(invx.shape, jnp.int32)
    for b in range(nb):
        r, c = b // 128, b % 128
        ax, bx = ax_ref[r, c], bx_ref[r, c]
        ay, by = ay_ref[r, c], by_ref[r, c]
        az, bz = az_ref[r, c], bz_ref[r, c]
        t0 = ax * invx
        t1 = bx * invx
        t_near = jnp.minimum(t0, t1)
        t_far = jnp.maximum(t0, t1)
        t0 = ay * invy
        t1 = by * invy
        t_near = jnp.maximum(t_near, jnp.minimum(t0, t1))
        t_far = jnp.minimum(t_far, jnp.maximum(t0, t1))
        t0 = az * invz
        t1 = bz * invz
        t_near = jnp.maximum(t_near, jnp.minimum(t0, t1))
        t_far = jnp.minimum(t_far, jnp.maximum(t0, t1))
        hit = (t_near <= t_far) & (t_far > 1e-4) & (vf_ref[r, c] > 0.0)
        tb = jnp.where(hit, jnp.maximum(t_near, 1e-4), jnp.inf)
        upd = tb < t_best
        t_best = jnp.where(upd, tb, t_best)
        best = jnp.where(upd, b, best)
    tb_ref[...] = t_best
    bi_ref[...] = best


def raycast_minargmin(a_min: jnp.ndarray, a_max: jnp.ndarray,
                      valid: jnp.ndarray, inv: jnp.ndarray,
                      interpret: bool = False):
    """(t_best, best) of the ray-AABB slab test, fused in VMEM.

    Args:
      a_min / a_max: [Bx, 3] box extents ALREADY translated by -origin.
      valid: [Bx] bool/num — invalid boxes never hit.
      inv: [H, W, 3] f32 reciprocal ray directions (zero-clamped upstream).

    Returns (t_best [H, W] f32 — inf where no hit, best [H, W] i32 — 0
    where no hit, matching jnp.argmin over an all-inf row).
    """
    h, w = inv.shape[:2]
    nb = a_min.shape[0]
    if nb > 1024:
        raise ValueError(f"raycast kernel packs boxes into (8,128): {nb}")
    # row block: largest multiple-of-8 divisor of H up to 128 (grid rows)
    br = next((c for c in range(min(h, 128), 0, -1)
               if h % c == 0 and (c % 8 == 0 or c == h)), h)
    row = pl.BlockSpec((br, w), lambda r: (r, 0))
    # box components packed into tile-aligned (8, 128) scalar tables —
    # Mosaic requires last-two-dim (8, 128) blocks, and 1D [Bx] arrays
    # squeeze badly under the vmap batching rule
    box = pl.BlockSpec((8, 128), lambda r: (0, 0))

    def pack(x):
        return jnp.pad(x.astype(jnp.float32), (0, 1024 - nb)).reshape(8, 128)

    vf = valid.astype(jnp.float32)
    comp = [pack(c) for c in (a_min[:, 0], a_min[:, 1], a_min[:, 2],
                              a_max[:, 0], a_max[:, 1], a_max[:, 2], vf)]
    invf = inv.astype(jnp.float32)
    return pl.pallas_call(
        functools.partial(_raycast_kernel, nb),
        grid=(h // br,),
        in_specs=[box] * 7 + [row] * 3,
        out_specs=[row, row],
        out_shape=[jax.ShapeDtypeStruct((h, w), jnp.float32),
                   jax.ShapeDtypeStruct((h, w), jnp.int32)],
        interpret=interpret,
    )(*comp, invf[..., 0], invf[..., 1], invf[..., 2])
