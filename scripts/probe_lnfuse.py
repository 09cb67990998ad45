#!/usr/bin/env python
"""ViT-L encoder LN-fusion probe.

The perceive trace shows 23 matmul+residual+LN-stats kOutput fusions at
~1.6 ms each (69 GB/s, EmitAllInputFeatureInSublanesOutputBatchInSublanes
emitter) while the standalone LN-stats reduce runs 0.21 ms (479 GB/s):
fusing the LN reduction into the dot cripples the matmul emitter. This
probe times the REAL `vit_features` (24 blocks at [64,257,1024], int8
serving weights like bench.py) under three LN treatments:

  base     XLA free fusion (current default)
  barrier  lax.optimization_barrier before LN stats (ECAP_LN_BARRIER=1)
  pallas   Pallas LN kernel at eligible sites (ECAP_PALLAS_LN=1)

Fenced by scalar readback; parity (max|diff| vs base) printed.
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

    def run(p, t):
        return jnp.sum(vit_features(p, t, cfg).astype(jnp.float32))

    results = {}
    for name, env in [("base", {}),
                      ("barrier", {"ECAP_LN_BARRIER": "1"}),
                      ("pallas", {"ECAP_PALLAS_LN": "1"})]:
        old = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            fn = jax.jit(lambda p, t: run(p, t))  # fresh fn -> fresh trace
            out = float(fn(params, tokens))  # compile + warm
            n = 8
            t0 = time.perf_counter()
            for _ in range(n):
                out = float(fn(params, tokens))
            dt = (time.perf_counter() - t0) / n
            results[name] = (dt, out)
            print(f"  {name:8s} {dt * 1e3:7.1f} ms/encode24  checksum {out:.3f}",
                  flush=True)
        finally:
            for k, v in old.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
    base = results["base"][1]
    for name, (_, out) in results.items():
        rel = abs(out - base) / max(abs(base), 1e-9)
        print(f"  {name:8s} checksum reldiff vs base: {rel:.2e}")


if __name__ == "__main__":
    main()
