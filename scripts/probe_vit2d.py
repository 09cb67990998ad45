#!/usr/bin/env python
"""2D-resident ViT encoder probe.

The headline trace's top item is 23 matmul+residual+LN-stats kOutput
fusions at ~1.6 ms / 69 GB/s (f32[64,257] stats computed alongside the
3D bf16[64,257,*] matmul — XLA picks the
EmitAllInputFeatureInSublanesOutputBatchInSublanes conv emitter for the
batched-3D form). `lax.optimization_barrier` splitting was a dead end
(scripts/probe_lnfuse.py). This probe instead keeps the residual stream
FLAT [B*T, D] between attention calls, so every LN-stats reduction and
MLP matmul is a plain 2D GEMM; only attention views [B, T, D] (a free
reshape in row-major layout).

Times the real ViT-L encode (24 blocks, [64,257,1024], int8 serving
weights like bench.py) base vs 2D-resident; fenced by scalar readback.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from embodied_captioning_tpu.config import VitConfig
    from embodied_captioning_tpu.models.common import (
        dense, layernorm, mha, mlp,
    )
    from embodied_captioning_tpu.models.quantize import quantize_params
    from embodied_captioning_tpu.models.vit import init_vit, vit_features

    cfg = VitConfig()
    params = init_vit(jax.random.PRNGKey(0), cfg)
    if os.environ.get("PROBE_INT8", "1") == "1":
        params = quantize_params(params)
    B = 64
    grid = cfg.image_size // cfg.patch_size
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(
        rng.standard_normal((B, grid * grid, cfg.patch_size ** 2 * 3)) * 0.1,
        jnp.bfloat16)

    def features_2d(p, patch_tokens):
        x = dense(p["patch"], patch_tokens)
        b = x.shape[0]
        cls = jnp.broadcast_to(p["cls"], (b, 1, cfg.width))
        x = (jnp.concatenate([cls, x], axis=1)
             + p["pos"][None]).astype(jnp.bfloat16)
        x = layernorm(p["ln_pre"], x)
        bsz, t, d = x.shape
        x2 = x.reshape(bsz * t, d)
        for blk in p["blocks"]:
            h = layernorm(blk["ln1"], x2).reshape(bsz, t, d)
            a, _ = mha(blk["attn"], h, cfg.heads)
            x2 = x2 + a.reshape(bsz * t, d)
            x2 = x2 + mlp(blk["mlp"], layernorm(blk["ln2"], x2))
        return layernorm(p["ln_post"], x2).reshape(bsz, t, d)

    def run_base(p, t):
        return jnp.sum(vit_features(p, t, cfg).astype(jnp.float32))

    def run_2d(p, t):
        return jnp.sum(features_2d(p, t).astype(jnp.float32))

    for name, fn in [("base", run_base), ("flat2d", run_2d)]:
        jfn = jax.jit(fn)
        out = float(jfn(params, tokens))  # compile + warm
        n = 8
        t0 = time.perf_counter()
        for _ in range(n):
            out = float(jfn(params, tokens))
        dt = (time.perf_counter() - t0) / n
        print(f"  {name:8s} {dt * 1e3:7.1f} ms/encode24  checksum {out:.3f}",
              flush=True)


if __name__ == "__main__":
    main()
