"""Pallas fused image preprocess: uint8 -> normalized patch tokens.

The XLA path (ops/image.preprocess_for_vit) does resize -> /255 -> normalize
-> patchify as separate HLOs; XLA fuses most of it, but the gather-heavy
resize still makes two passes over HBM. This kernel fuses the whole chain
for the common square-to-square case: each grid step emits one row of
patches, reading only the source rows it needs (bilinear, half-pixel
centers), normalizing with the CLIP constants, and writing the [p*p*3]
token layout the ViT patch-embedding matmul consumes directly.

Gated behind ECAP_USE_PALLAS (see ops/pallas/dispatch.py); parity-tested
against the XLA path in tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..image import CLIP_MEAN, CLIP_STD


def _preprocess_kernel(img_ref, y0_ref, y1_ref, fy_ref, x0_ref, x1_ref,
                       fx_ref, scale_ref, bias_ref, out_ref, *, patch: int,
                       out_w: int):
    """Grid dim 0 = patch-row index. img_ref: [H, W, 3] u8 (whole image);
    scale/bias: [3] fused normalize constants (x*scale + bias);
    out_ref: [1, gw, patch*patch*3] tokens for this patch row."""
    pr = pl.program_id(0)
    gw = out_w // patch

    rows = []
    for local_y in range(patch):
        oy = pr * patch + local_y
        ya = y0_ref[oy]
        yb = y1_ref[oy]
        fy = fy_ref[oy]
        row_a = img_ref[ya, :, :].astype(jnp.float32)
        row_b = img_ref[yb, :, :].astype(jnp.float32)
        row = row_a * (1.0 - fy) + row_b * fy  # [W, 3]
        # horizontal bilinear via precomputed gathers
        a = row[x0_ref[:], :]
        b = row[x1_ref[:], :]
        fx = fx_ref[:][:, None]
        out_row = a * (1.0 - fx) + b * fx  # [out_w, 3]
        out_row = out_row * scale_ref[:] + bias_ref[:]
        rows.append(out_row)
    # stack into [patch, out_w, 3] -> tokens [gw, patch*patch*3]
    block = jnp.stack(rows, axis=0)
    block = block.reshape(patch, gw, patch, 3)
    block = jnp.transpose(block, (1, 0, 2, 3)).reshape(gw, patch * patch * 3)
    out_ref[0, :, :] = block.astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("out_size", "patch", "interpret"))
def fused_preprocess(img_u8: jnp.ndarray, out_size: int, patch: int,
                     interpret: bool = False) -> jnp.ndarray:
    """[H, W, 3] uint8 -> [T, p*p*3] float32 normalized patch tokens."""
    h, w, _ = img_u8.shape

    def coords(out_n, in_n):
        scale = in_n / out_n
        src = (jnp.arange(out_n, dtype=jnp.float32) + 0.5) * scale - 0.5
        src = jnp.clip(src, 0.0, in_n - 1.0)
        i0 = jnp.floor(src).astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, in_n - 1)
        return i0, i1, src - i0.astype(jnp.float32)

    y0, y1, fy = coords(out_size, h)
    x0, x1, fx = coords(out_size, w)
    import numpy as _np

    scale = jnp.asarray(1.0 / (255.0 * _np.asarray(CLIP_STD)), jnp.float32)
    bias = jnp.asarray(-_np.asarray(CLIP_MEAN) / _np.asarray(CLIP_STD),
                       jnp.float32)
    gh = out_size // patch
    gw = out_size // patch
    out = pl.pallas_call(
        functools.partial(_preprocess_kernel, patch=patch, out_w=out_size),
        grid=(gh,),
        in_specs=[
            pl.BlockSpec((h, w, 3), lambda i: (0, 0, 0)),
            pl.BlockSpec((out_size,), lambda i: (0,)),
            pl.BlockSpec((out_size,), lambda i: (0,)),
            pl.BlockSpec((out_size,), lambda i: (0,)),
            pl.BlockSpec((out_size,), lambda i: (0,)),
            pl.BlockSpec((out_size,), lambda i: (0,)),
            pl.BlockSpec((out_size,), lambda i: (0,)),
            pl.BlockSpec((3,), lambda i: (0,)),
            pl.BlockSpec((3,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((1, gw, patch * patch * 3),
                               lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((gh, gw, patch * patch * 3),
                                       jnp.float32),
        interpret=interpret,
    )(img_u8, y0, y1, fy, x0, x1, fx, scale, bias)
    return out.reshape(gh * gw, patch * patch * 3)
