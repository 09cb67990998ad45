#!/usr/bin/env python
"""Fenced per-stage timing of the fused perception program.

Each stage is jitted standalone and fenced by a scalar checksum readback
(see bench.py for why block_until_ready is not a fence here). Every
standalone stage carries the ~27 ms tunnel fence, so stage times
over-estimate their share inside the fused program; use the fused total as
the denominator.

Env knobs: BENCH_PRESET (default large), BENCH_BATCH (default 16),
BENCH_CAPTION_SLOTS (default 4), BENCH_INT8 (default 1), BENCH_ITERS
(default 4 timed reps per stage; median reported).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    preset = os.environ.get("BENCH_PRESET", "large")
    batch = int(os.environ.get("BENCH_BATCH", "16"))
    slots = int(os.environ.get("BENCH_CAPTION_SLOTS", "4"))
    reps = int(os.environ.get("BENCH_ITERS", "4"))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from embodied_captioning_tpu.config import load_config
    from embodied_captioning_tpu.models import captioner as CAP
    from embodied_captioning_tpu.models import detector as DET
    from embodied_captioning_tpu.models import sbert as SB
    from embodied_captioning_tpu.models.vit import encode_image
    from embodied_captioning_tpu.perception import init_perception, perceive

    cfg = load_config(
        preset, overrides=[f"runtime.caption_slots_per_frame={slots}",
                   "runtime.caption_invalid_slots=true"])
    params = init_perception(jax.random.PRNGKey(0), cfg)
    if os.environ.get("BENCH_INT8", "1") == "1":
        from embodied_captioning_tpu.models.quantize import quantize_params

        params = quantize_params(params)

    size = cfg.detector.image_size
    sensor = cfg.sensors.height
    paste = cfg.detector.paste_size or size
    n = cfg.detector.max_detections
    c = batch * slots if 0 < slots < n else batch * n
    crop_size = cfg.captioner.vision.image_size
    rng_np = np.random.default_rng(0)
    images = jnp.asarray(
        (rng_np.random((batch, sensor, sensor, 3)) * 255).astype(np.uint8))
    det_images = jnp.asarray(
        (rng_np.random((batch, size, size, 3)) * 255).astype(np.uint8))
    crops = jnp.asarray(
        (rng_np.random((c, crop_size, crop_size, 3)) * 255).astype(np.uint8))
    key = jax.random.PRNGKey(1)

    def timed(name, fn, *args):
        """jit fn, warm it, return median fenced seconds of `reps` calls."""
        jfn = jax.jit(fn)
        cs = jfn(*args)
        _ = float(cs)  # compile + warm
        ts = []
        for _i in range(reps):
            t0 = time.perf_counter()
            _ = float(jfn(*args))
            ts.append(time.perf_counter() - t0)
        ms = 1000.0 * sorted(ts)[len(ts) // 2]
        print(f"  {name:<28s} {ms:8.1f} ms", flush=True)
        return ms

    out = {}
    print(f"[stages] preset={preset} batch={batch} slots={slots} "
          f"crops={c}", flush=True)

    # fence-only cost: round-trip of a trivial program
    out["fence_ms"] = timed(
        "fence (null program)",
        lambda x: jnp.sum(x), jnp.ones((8,), jnp.float32))

    if sensor != size:
        from embodied_captioning_tpu.ops.image import resize_bilinear

        def pre_fn(images):
            x = jnp.clip(resize_bilinear(images.astype(jnp.float32), size,
                                         size), 0, 255).astype(jnp.uint8)
            return jnp.sum(x.astype(jnp.int32))

        out["preprocess_ms"] = timed(
            f"preprocess {sensor}->{size}", pre_fn, images)

    def det_fwd(params, det_images):
        det = DET.forward(params.detector, det_images, cfg.detector)
        fm = DET.full_masks(det, paste, size)
        return jnp.sum(det.boxes) + jnp.sum(fm)

    out["detector_ms"] = timed("detector+masks+paste", det_fwd, params,
                               det_images)

    def det_nopaste(params, det_images):
        det = DET.forward(params.detector, det_images, cfg.detector)
        return jnp.sum(det.boxes) + jnp.sum(det.masks)

    out["detector_nopaste_ms"] = timed(
        "detector (no paste)", det_nopaste, params, det_images)

    def det_backbone(params, det_images):
        fpn = DET.backbone_fpn(params.detector,
                               det_images.astype(jnp.float32) / 255.0,
                               cfg.detector)
        return sum(jnp.sum(f.astype(jnp.float32)) for f in fpn)

    out["backbone_fpn_ms"] = timed("backbone+FPN only", det_backbone, params,
                                   det_images)

    def crops_fn(params, images, det_images):
        from embodied_captioning_tpu.ops.detections import expand_boxes
        from embodied_captioning_tpu.ops.image import crop_and_resize

        det = DET.forward(params.detector, det_images, cfg.detector)
        boxes = expand_boxes(det.boxes, 0.2, size, size) * (sensor / size)
        e = images.shape[0]
        flat_scores = (det.scores * det.valid).reshape(e * n)
        _, sel = jax.lax.top_k(flat_scores, c)
        boxes_flat = boxes.reshape(e * n, 4)[sel]
        img_idx = sel // n

        def crop_one(img, box):
            return crop_and_resize(img.astype(jnp.float32), box[None],
                                   crop_size)[0]

        cr = jax.vmap(crop_one)(images[img_idx], boxes_flat)
        return jnp.sum(cr)

    out["det_plus_crops_ms"] = timed("detector+crops", crops_fn, params,
                                     images, det_images)

    def encode_fn(params, crops):
        pooled, emb = encode_image(params.captioner["vision"], crops,
                                   cfg.captioner.vision)
        return jnp.sum(pooled) + jnp.sum(emb)

    out["vit_encode_ms"] = timed("ViT encode (crops)", encode_fn, params,
                                 crops)

    def gen_fn(params, crops, key):
        toks, lps, lens = CAP.generate(params.captioner, crops, key,
                                       cfg.captioner,
                                       max_len=cfg.captioner.max_caption_len)
        return jnp.sum(toks) + jnp.sum(lens)

    out["generate_ms"] = timed("generate (encode+decode)", gen_fn, params,
                               crops, key)
    out["decode_est_ms"] = round(out["generate_ms"] - out["vit_encode_ms"], 1)
    print(f"  {'decode (generate-encode)':<28s} {out['decode_est_ms']:8.1f} ms",
          flush=True)

    se_len = cfg.sentence_encoder.max_len
    toks = jnp.ones((c, se_len), jnp.int32) * 5

    def sb_fn(params, toks):
        return jnp.sum(SB.encode_tokens(params.sbert, toks,
                                        cfg.sentence_encoder))

    out["sbert_ms"] = timed("sbert", sb_fn, params, toks)

    def fused(params, images, key):
        r = perceive(params, images, key, cfg)
        return (jnp.sum(r.detections.boxes) + jnp.sum(r.caption_tokens)
                + jnp.sum(r.detections.embeddings))

    out["fused_ms"] = timed("FUSED perceive", fused, params, images, key)
    out["fused_fps"] = round(1000.0 * batch / out["fused_ms"], 1)
    print(json.dumps({k: round(v, 1) if isinstance(v, float) else v
                      for k, v in out.items()}))


if __name__ == "__main__":
    main()
