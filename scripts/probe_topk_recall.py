#!/usr/bin/env python
"""Probe: does approx_max_k (recall_target=0.95) in the RPN change final
detections at the serving operating point?

CPU lowers approx_max_k to an exact sort, so this must run ON TPU. Renders
sim frames at sensor resolution, runs the large-preset detector forward with
approx_topk True vs False (same params), and reports: per-frame detection
count deltas, greedy box-IoU matching rate, and matched score/class
agreement. Also times both variants (fenced).

Usage: python scripts/probe_topk_recall.py [--batch 8] [--frames sim|noise]
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", default="sim", choices=["sim", "noise"])
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from embodied_captioning_tpu.config import load_config
    from embodied_captioning_tpu.models import detector as DET
    from embodied_captioning_tpu.ops.detections import pairwise_iou
    from embodied_captioning_tpu.ops.image import resize_bilinear

    cfg = load_config("large")
    # norm="gn": the untrained affine norm is an identity (activations blow
    # up through depth and every proposal decodes degenerate), which makes
    # the comparison vacuous; GroupNorm keeps untrained activations scaled
    # while exercising the identical top-k mechanism at serving scale
    dcfg = dataclasses.replace(cfg.detector, norm="gn")
    size = dcfg.image_size
    params = DET.init_detector(jax.random.PRNGKey(0), dcfg)

    if args.frames == "sim":
        from embodied_captioning_tpu.envs.sim import RaycastSim

        fl = []
        for i in range(args.batch):
            sim = RaycastSim(cfg.sim, cfg.sensors, seed=i)
            for _ in range(3 + (i % 5)):
                sim.step(2 if i % 2 else 1)
            fl.append(np.asarray(sim.observe()["rgb"]))
        frames = jnp.asarray(np.stack(fl))
    else:
        rng = np.random.default_rng(0)
        frames = jnp.asarray(rng.integers(
            0, 255, (args.batch, cfg.sensors.height, cfg.sensors.width, 3)
        ).astype(np.uint8))
    det_in = jnp.clip(resize_bilinear(frames.astype(jnp.float32), size, size),
                      0, 255)

    # raw RPN candidate recall: |approx top-k ∩ exact top-k| / k over the
    # full anchor objectness (independent of training state / thresholds)
    @jax.jit
    def rpn_obj(p, x):
        fpn = DET.backbone_fpn(p, x / 255.0, dcfg)
        obj, _ = DET._rpn_head(p, fpn)
        return obj

    obj = np.asarray(rpn_obj(params, det_in).astype(jnp.float32))
    k = dcfg.pre_nms_topk
    rec = []
    for i in range(obj.shape[0]):
        o = jnp.asarray(obj[i])
        _, ex = jax.lax.top_k(o, k)
        _, ap = jax.lax.approx_max_k(o, k, recall_target=0.95)
        rec.append(len(set(np.asarray(ex).tolist())
                       & set(np.asarray(ap).tolist())) / k)
    print(f"  RPN candidate recall (approx vs exact, k={k}): "
          f"mean {np.mean(rec):.4f} min {np.min(rec):.4f}", flush=True)

    outs = {}
    for name, approx in (("exact", False), ("approx", True)):
        # score_threshold 0 so the end-to-end comparison is non-vacuous
        # even with untrained weights (every slot fills)
        c = dataclasses.replace(dcfg, approx_topk=approx,
                                score_threshold=0.0)  # non-vacuous untrained

        @jax.jit
        def fwd(p, x, c=c):
            d = DET.forward(p, x, c, with_masks=False)
            return d, jnp.sum(d.boxes) + jnp.sum(d.scores)

        det, cs = fwd(params, det_in)
        _ = float(cs)  # compile + fence
        ts = []
        for _i in range(args.iters):
            t0 = time.perf_counter()
            _, cs = fwd(params, det_in)
            _ = float(cs)
            ts.append(time.perf_counter() - t0)
        ms = 1000.0 * sorted(ts)[len(ts) // 2]
        outs[name] = det
        print(f"  {name:<7s} forward (no masks): {ms:8.2f} ms "
              f"(batch {args.batch})", flush=True)

    a, b = outs["exact"], outs["approx"]
    va = np.asarray(a.valid)
    vb = np.asarray(b.valid)
    print(f"  detections/frame: exact {va.sum(1).tolist()} "
          f"approx {vb.sum(1).tolist()}", flush=True)
    matched = 0
    total = 0
    score_d = []
    cls_agree = []
    for i in range(va.shape[0]):
        if va[i].sum() == 0:
            continue
        iou = np.asarray(pairwise_iou(a.boxes[i], b.boxes[i]))
        iou = iou * va[i][:, None] * vb[i][None, :]
        for j in np.where(va[i])[0]:
            total += 1
            k = int(iou[j].argmax())
            if iou[j, k] > 0.5:
                matched += 1
                score_d.append(abs(float(a.scores[i, j]) -
                                   float(b.scores[i, k])))
                cls_agree.append(int(a.classes[i, j]) == int(b.classes[i, k]))
    rate = matched / max(total, 1)
    print(f"  exact->approx match rate (IoU>0.5): {matched}/{total} "
          f"= {rate:.3f}", flush=True)
    if score_d:
        print(f"  matched |score delta| mean {np.mean(score_d):.4f} "
              f"max {np.max(score_d):.4f}; class agree "
              f"{np.mean(cls_agree):.3f}", flush=True)


if __name__ == "__main__":
    main()
