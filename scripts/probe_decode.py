#!/usr/bin/env python
"""Decode-only scaling probe: what bounds the KV-cached caption decode?

Times ONLY the 29-step lax.scan (cross-KV precomputed from a fabricated
pooled-token tensor — no ViT). Varies batch, layer count, and vocab to
attribute the per-step cost:
  - time ~ layers, invariant to batch  -> per-op fixed latency bound
  - time ~ batch                       -> compute/HBM bound
  - big drop with small vocab          -> head-bound
Fenced by scalar readback (see bench.py).
"""

import os
import sys
import time
import dataclasses

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from embodied_captioning_tpu.config import load_config
    from embodied_captioning_tpu.models import captioner as CAP
    from embodied_captioning_tpu.models.common import KVCache, precompute_kv
    from embodied_captioning_tpu.models.quantize import quantize_params

    base = load_config("large").captioner

    def decode_ms(batch, layers, cross_layers, vocab, reps=3):
        cfg = dataclasses.replace(
            base,
            text=dataclasses.replace(base.text, layers=layers,
                                     cross_layers=cross_layers,
                                     vocab_size=vocab))
        params = quantize_params(
            CAP.init_captioner(jax.random.PRNGKey(0), cfg))
        t = cfg.text
        max_len = cfg.max_caption_len
        pooled = jnp.asarray(np.random.default_rng(0).standard_normal(
            (batch, cfg.vision.pool_queries, cfg.vision.width)), jnp.bfloat16)

        @jax.jit
        def decode(params, pooled, key):
            head_dim = t.width // t.heads
            tc = tuple(KVCache.create(batch, max_len, t.heads, head_dim)
                       for _ in range(t.layers))
            mc = tuple(KVCache.create(batch, max_len, t.heads, head_dim)
                       for _ in range(t.cross_layers))
            cross_kvs = tuple(precompute_kv(blk["xattn"], pooled, t.heads)
                              for blk in params["mm_blocks"])

            def step(carry, pos):
                tok, fin, tc, mc, key = carry
                logits, tc, mc = CAP._decode_step(
                    params, tok, pos, cross_kvs, tc, mc, cfg)
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return (nxt, fin, tc, mc, key), nxt

            tok0 = jnp.full((batch,), CAP.BOS_ID, jnp.int32)
            fin0 = jnp.zeros((batch,), bool)
            (_, _, _, _, _), toks = jax.lax.scan(
                step, (tok0, fin0, tc, mc, key), jnp.arange(max_len - 1))
            return jnp.sum(toks)

        key = jax.random.PRNGKey(1)
        _ = float(decode(params, pooled, key))  # compile+warm
        ts = []
        for _i in range(reps):
            t0 = time.perf_counter()
            _ = float(decode(params, pooled, key))
            ts.append(time.perf_counter() - t0)
        ms = 1000.0 * sorted(ts)[len(ts) // 2]
        print(f"  batch={batch:<4d} layers={layers:<3d} xlayers="
              f"{cross_layers:<3d} vocab={vocab:<6d} -> {ms:7.1f} ms",
              flush=True)
        return ms

    print("[probe] 29-step decode scan only (fence ~24 ms included)",
          flush=True)
    decode_ms(64, 12, 12, 49408)   # reference point
    decode_ms(64, 6, 6, 49408)     # half the layers
    decode_ms(128, 12, 12, 49408)  # double the batch
    decode_ms(256, 12, 12, 49408)  # 4x the batch
    decode_ms(64, 12, 12, 1024)    # tiny head
    decode_ms(64, 12, 0, 49408)    # no cross layers


if __name__ == "__main__":
    main()
