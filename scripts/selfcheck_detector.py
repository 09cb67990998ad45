#!/usr/bin/env python
"""Detector learning self-check: train the FPN/RPN/ROI detector on simulator
GT and measure mAP improving (the detection-side analog of
selfcheck_training.py; validates the loss family end-to-end)."""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def collect(cfg, episodes, steps_per_ep, seed0, rng, chunk=32,
            skip_seeds=()):
    """`skip_seeds` = (start, n): scene seeds in [start, start+n) are
    remapped to start+n.. — used by the scenes split so a TRAINING pool
    larger than the eval block's first seed can never include the fixed
    eval scenes (<=start-scene runs are bit-identical with or without)."""
    return _collect(cfg, episodes, steps_per_ep, seed0, rng, chunk,
                    skip_seeds)


def _collect(cfg, episodes, steps_per_ep, seed0, rng, chunk, skip_seeds):
    """Batched collection at DETECTOR scale: walk all sims on host first,
    then render (scene, pose) pairs in chunked `render_batch` launches;
    rgb/boxes/masks are resized to detector resolution ON DEVICE (masks to
    uint8) before the one fetch per chunk. Through the tunnel this is ~20x
    fewer round trips AND ~13x fewer bytes than per-frame observe()+
    full-res f32 masks (which measured ~10 GB for a 2.4k-frame ladder)."""
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from embodied_captioning_tpu.envs.sim import (
        RaycastSim, gt_detections, render_batch,
    )
    from embodied_captioning_tpu.ops.image import resize_bilinear

    sims, jobs = [], []
    for ep in range(episodes):
        seed = seed0 + ep
        if skip_seeds and seed >= skip_seeds[0]:
            seed += skip_seeds[1]
        sim = RaycastSim(cfg.sim, cfg.sensors, seed=seed)
        sims.append(sim)
        for _ in range(steps_per_ep):
            for _ in range(int(rng.integers(2, 6))):
                sim.step(int(rng.integers(1, 4)))
            jobs.append((ep, np.asarray(sim.agent.camera_matrix(),
                                        np.float32)))

    n_det = cfg.detector.max_detections
    size = cfg.detector.image_size
    sensor = cfg.sensors.height
    min_px = max(50, (sensor * cfg.sensors.width) // 2184)
    gt_batch = jax.vmap(functools.partial(
        gt_detections, max_instances=n_det, min_pixels=min_px))

    @jax.jit
    def render_chunk(scenes, poses):
        out = render_batch(scenes, poses, sensor, cfg.sensors.width,
                           cfg.sensors.hfov_deg, cfg.sensors.max_depth)
        dets = gt_batch(out["instances"], out["classes"])
        scale = size / sensor
        rgb = out["rgb"]
        if sensor != size:
            rgb = jnp.clip(resize_bilinear(rgb.astype(jnp.float32), size,
                                           size), 0, 255).astype(jnp.uint8)
            dets = dets.replace(boxes=dets.boxes * scale)
        m = jnp.transpose(dets.masks, (0, 2, 3, 1))      # [B, H, W, N]
        m = resize_bilinear(m, size, size) >= 0.5
        masks = jnp.transpose(m, (0, 3, 1, 2)).astype(jnp.uint8)
        return rgb, dets.replace(masks=masks)

    frames = []
    for i in range(0, len(jobs), chunk):
        part = jobs[i:i + chunk]
        scenes = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[sims[e].scene for e, _ in part])
        poses = jnp.asarray(np.stack([p for _, p in part]))
        rgb, dets = render_chunk(scenes, poses)
        rgb = np.asarray(rgb)
        dets = jax.tree_util.tree_map(np.asarray, dets)
        for b in range(len(part)):
            frames.append((rgb[b],
                           jax.tree_util.tree_map(lambda x: x[b], dets)))
    return frames


def save_corpus(path, frames):
    """Serialize a collected frame list to one npz (fixed eval corpus)."""
    import numpy as np

    rgb = np.stack([f[0] for f in frames])
    det = {k: np.stack([np.asarray(getattr(f[1], k)) for f in frames])
           for k in ("boxes", "classes", "scores", "logits", "valid",
                     "masks")}
    np.savez_compressed(path, rgb=rgb, **det)


def load_corpus(path):
    import numpy as np

    from embodied_captioning_tpu.ops.detections import Detections

    z = np.load(path)
    return [(z["rgb"][i], Detections(
        boxes=z["boxes"][i], classes=z["classes"][i], scores=z["scores"][i],
        logits=z["logits"][i], valid=z["valid"][i], masks=z["masks"][i]))
        for i in range(z["rgb"].shape[0])]


def corpus_checksum(frames):
    """Cheap content hash so rung logs prove they evaluated the same bytes."""
    import hashlib

    import numpy as np

    h = hashlib.sha256()
    for rgb, det in frames:
        h.update(np.ascontiguousarray(rgb))
        h.update(np.ascontiguousarray(np.asarray(det.boxes, np.float32)))
        h.update(np.ascontiguousarray(np.asarray(det.valid)))
    return h.hexdigest()[:16]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="tiny")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--lr-schedule", default="constant",
                    choices=["constant", "cosine"])
    ap.add_argument("--head", default="ce")
    ap.add_argument("--split", default="scenes", choices=["scenes", "frames"],
                    help="test on unseen scenes (hard) or held-out frames "
                         "of the training scenes (standard)")
    ap.add_argument("--episodes", type=int, default=6)
    ap.add_argument("--augment", action="store_true",
                    help="flip + color-jitter training batches")
    ap.add_argument("--augment-crop", action="store_true",
                    help="add random-resized-crop (zoom 0.55-0.95) to "
                         "--augment: scale jitter so unseen-scene boxes at "
                         "novel apparent sizes stay in-distribution")
    ap.add_argument("--ema", type=float, default=0.0,
                    help="EMA decay for an evaluation weight average "
                         "(device-train path only; 0 disables). Reported "
                         "as map50_after_ema alongside the raw number")
    ap.add_argument("--device-train", action="store_true",
                    help="keep the training corpus in HBM and run "
                         "batch-gather + augmentation + train step as ONE "
                         "jitted program (ops/augment.py). The host-side "
                         "numpy augmentation loop serializes ~0.2 s/step on "
                         "this 1-core host; on-device it is device-bound")
    ap.add_argument("--seed", type=int, default=0,
                    help="training seed: init key, walk RNG, batch order, "
                         "augmentation draws (scene geometry seeds stay "
                         "fixed, so repeat-seed rungs measure training "
                         "variance on identical scene pools)")
    ap.add_argument("--eval-scenes", type=int, default=8)
    ap.add_argument("--eval-ep-steps", type=int, default=12)
    ap.add_argument("--eval-seed", type=int, default=500,
                    help="unseen-scene eval draw: scene seeds start here and "
                         "its walk RNG is private, so the corpus no longer "
                         "shifts with --episodes/--seed (pre-round-3-final "
                         "rungs shared the training RNG and each evaluated "
                         "a different draw — docs/BENCH.md ladder spread)")
    ap.add_argument("--tta", action="store_true",
                    help="also report unseen-scene mAP with horizontal-flip "
                         "test-time augmentation (paired on the same "
                         "trained weights)")
    ap.add_argument("--eval-cache", default=None,
                    help="npz path: save the eval corpus on first run, load "
                         "it afterwards — repeat rungs then share literally "
                         "identical eval bytes (checksum printed)")
    ap.add_argument("--eval-wide", type=int, default=0,
                    help="scenes for a SECOND, wider unseen-scene eval "
                         "corpus evaluated paired on the same trained "
                         "weights (0 = off). Measures how much of the "
                         "per-seed spread is eval-draw noise vs training "
                         "variance: the protocol corpus is only 8 scenes")
    ap.add_argument("--eval-wide-seed", type=int, default=100000,
                    help="scene-seed origin of the wide corpus; far above "
                         "any training pool so it can never leak (asserted)")
    ap.add_argument("--eval-wide-cache", default=None,
                    help="npz cache for the wide corpus (like --eval-cache)")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from embodied_captioning_tpu.config import load_config
    from embodied_captioning_tpu.models import detector as DET
    from embodied_captioning_tpu.ops.detections import Detections
    from embodied_captioning_tpu.utils.metrics import evaluate_detections

    cfg = load_config(args.preset, overrides=list(args.overrides))
    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    wide_frames = None
    if args.split == "scenes":
        train_frames = collect(cfg, args.episodes, 16, 0, rng,
                               skip_seeds=(args.eval_seed,
                                           args.eval_scenes))
        # unseen-scene eval on a FIXED corpus: its own RNG + scene seeds,
        # optionally cached to disk, so rung-to-rung deltas measure the
        # model, not the eval draw (with 2 shared-RNG scenes the mAP@50
        # swung 0.43-0.71 between comparable rungs — docs/BENCH.md)
        if args.eval_cache and os.path.exists(args.eval_cache):
            test_frames = load_corpus(args.eval_cache)
        else:
            test_frames = collect(cfg, args.eval_scenes, args.eval_ep_steps,
                                  args.eval_seed,
                                  np.random.default_rng(args.eval_seed))
            if args.eval_cache:
                save_corpus(args.eval_cache, test_frames)
        print(f"[selfcheck-det] eval corpus {len(test_frames)} frames, "
              f"sha {corpus_checksum(test_frames)}", flush=True)
        if args.eval_wide > 0:
            # leak guard: training scene seeds reach at most
            # episodes + eval_scenes (after the skip remap); the wide block
            # must start strictly above that AND clear the primary block
            assert args.eval_wide_seed > args.episodes + args.eval_scenes, \
                "--eval-wide-seed inside the training seed range"
            assert (args.eval_wide_seed >= args.eval_seed + args.eval_scenes
                    or args.eval_wide_seed + args.eval_wide <= args.eval_seed)
            if args.eval_wide_cache and os.path.exists(args.eval_wide_cache):
                wide_frames = load_corpus(args.eval_wide_cache)
            else:
                wide_frames = collect(
                    cfg, args.eval_wide, args.eval_ep_steps,
                    args.eval_wide_seed,
                    np.random.default_rng(args.eval_wide_seed))
                if args.eval_wide_cache:
                    save_corpus(args.eval_wide_cache, wide_frames)
            print(f"[selfcheck-det] wide eval corpus {len(wide_frames)} "
                  f"frames, sha {corpus_checksum(wide_frames)}", flush=True)
    else:  # held-out frames of the same scenes
        all_frames = collect(cfg, args.episodes, 20, 0, rng)
        order = rng.permutation(len(all_frames))
        n_test = max(8, len(all_frames) // 6)
        test_frames = [all_frames[i] for i in order[:n_test]]
        train_frames = [all_frames[i] for i in order[n_test:]]
    print(f"[selfcheck-det] {len(train_frames)} train / "
          f"{len(test_frames)} test frames ({time.time() - t0:.0f}s)",
          flush=True)

    dcfg = cfg.detector
    size = dcfg.image_size
    params = DET.init_detector(jax.random.PRNGKey(args.seed), dcfg)
    if args.lr_schedule == "cosine":
        # warmup + cosine decay: the constant-lr rungs showed large
        # seed-to-seed spread with late-training loss spikes (docs/BENCH.md
        # repeat-seed table); decaying to lr/20 settles the endpoint
        sched = optax.warmup_cosine_decay_schedule(
            0.0, args.lr, min(500, args.steps // 10), args.steps,
            args.lr / 20)
        opt = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(sched))
    else:
        opt = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(args.lr))
    opt_state = opt.init(params)

    def resize_frame(rgb):
        from embodied_captioning_tpu.ops.image import resize_bilinear

        if rgb.shape[0] != size:
            scale = size / rgb.shape[0]
            return np.asarray(jnp.clip(resize_bilinear(
                jnp.asarray(rgb, jnp.float32), size, size), 0, 255)
            ).astype(np.uint8), scale
        return rgb, 1.0

    def batch_of(frames, idx, augment=False):
        imgs, dets = [], []
        for i in idx:
            rgb, det = frames[i]
            if augment:
                # horizontal flip + brightness/color jitter (the detector
                # dataset family's stacks live in labeling/datasets.py;
                # here GT masks are full-frame so the flip stays exact)
                if args.augment_crop and rng.random() < 0.5:
                    # random-resized-crop (zoom in): nearest resample of
                    # rgb+masks, exact box transform, drop boxes that
                    # leave the window or shrink to slivers
                    h0, w0 = rgb.shape[:2]
                    s = rng.uniform(0.55, 0.95)
                    ch, cw = max(int(h0 * s), 8), max(int(w0 * s), 8)
                    oy = int(rng.integers(0, h0 - ch + 1))
                    ox = int(rng.integers(0, w0 - cw + 1))
                    yi = oy + (np.arange(h0) * ch) // h0
                    xi = ox + (np.arange(w0) * cw) // w0
                    rgb = rgb[yi][:, xi]
                    mk = np.asarray(det.masks)[:, yi][:, :, xi]
                    bx = np.asarray(det.boxes, np.float32)
                    sx, sy = w0 / cw, h0 / ch
                    nb = np.stack([
                        np.clip((bx[:, 0] - ox) * sx, 0, w0),
                        np.clip((bx[:, 1] - oy) * sy, 0, h0),
                        np.clip((bx[:, 2] - ox) * sx, 0, w0),
                        np.clip((bx[:, 3] - oy) * sy, 0, h0)], axis=1)
                    keep = ((nb[:, 2] - nb[:, 0] >= 4)
                            & (nb[:, 3] - nb[:, 1] >= 4)
                            & np.asarray(det.valid))
                    det = det.replace(boxes=jnp.asarray(nb),
                                      masks=jnp.asarray(mk),
                                      valid=jnp.asarray(keep))
                if rng.random() < 0.5:
                    w = rgb.shape[1]
                    rgb = np.ascontiguousarray(rgb[:, ::-1])
                    bx = np.asarray(det.boxes)
                    flipped = np.stack([w - bx[:, 2], bx[:, 1],
                                        w - bx[:, 0], bx[:, 3]], axis=1)
                    det = det.replace(
                        boxes=jnp.asarray(flipped),
                        masks=jnp.asarray(np.asarray(det.masks)[:, :, ::-1]))
                rgb = np.clip(rgb.astype(np.float32)
                              * rng.uniform(0.75, 1.25)
                              + rng.uniform(-15, 15, size=(1, 1, 3)),
                              0, 255).astype(np.uint8)
            rgb2, scale = resize_frame(rgb)
            imgs.append(rgb2)
            dets.append(det.replace(boxes=det.boxes * scale))
        stack = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *dets)
        return jnp.asarray(np.stack(imgs)), stack

    @jax.jit
    def step_fn(params, opt_state, images, gt):
        (loss, aux), grads = jax.value_and_grad(
            lambda p: DET.detector_loss(p, images, gt, dcfg,
                                        head=args.head), has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    # mAP sweeps the PR curve, so evaluation uses a low score threshold
    # (COCO practice; the runtime threshold stays dcfg.score_threshold)
    import dataclasses as _dc

    eval_cfg = _dc.replace(dcfg, score_threshold=0.05)

    def eval_map(params, frames, tta=False):
        fwd = (functools.partial(DET.forward_tta, with_masks=False) if tta
               else functools.partial(DET.forward, with_masks=False))
        preds, gts = [], []
        for i in range(0, len(frames) - args.batch + 1, args.batch):
            images, gt = batch_of(frames, range(i, i + args.batch))
            det = fwd(params, images, eval_cfg)
            for b in range(images.shape[0]):
                preds.append(Detections(
                    boxes=det.boxes[b], classes=det.classes[b],
                    scores=det.scores[b], logits=det.logits[b],
                    valid=det.valid[b]))
                gts.append(jax.tree_util.tree_map(lambda x: x[b], gt))
        return evaluate_detections(preds, gts, dcfg.num_classes)["map"]

    def eval_mask_iou(params, frames):
        """Mean mask IoU of box-matched (IoU>=0.5, same-class) detections —
        proves the mask head learned shapes, not noise (masks feed the voxel
        fusion + pseudo-label raytracing)."""
        tot, cnt = 0.0, 0
        for i in range(0, len(frames) - args.batch + 1, args.batch):
            images, gt = batch_of(frames, range(i, i + args.batch))
            det = DET.forward(params, images, dcfg, with_masks=True)
            fm = np.asarray(DET.full_masks(det, size)) > 0.5  # [B,N,S,S]
            gt_np = jax.tree_util.tree_map(np.asarray, gt)
            gh = gt_np.masks.shape[-1]
            sel = (np.arange(size) * gh) // size  # nearest resample to S
            gmasks = gt_np.masks[:, :, sel][:, :, :, sel] > 0.5
            for b in range(images.shape[0]):
                for d in np.flatnonzero(np.asarray(det.valid[b])):
                    pb = np.asarray(det.boxes[b, d])
                    gb = gt_np.boxes[b]
                    ix1 = np.maximum(pb[0], gb[:, 0])
                    iy1 = np.maximum(pb[1], gb[:, 1])
                    ix2 = np.minimum(pb[2], gb[:, 2])
                    iy2 = np.minimum(pb[3], gb[:, 3])
                    inter = (np.maximum(ix2 - ix1, 0)
                             * np.maximum(iy2 - iy1, 0))
                    pa = max((pb[2] - pb[0]) * (pb[3] - pb[1]), 1e-6)
                    ga = ((gb[:, 2] - gb[:, 0]) * (gb[:, 3] - gb[:, 1]))
                    iou = inter / np.maximum(pa + ga - inter, 1e-6)
                    iou = np.where(
                        gt_np.valid[b]
                        & (gt_np.classes[b] == int(det.classes[b, d])),
                        iou, 0.0)
                    g = int(np.argmax(iou))
                    if iou[g] < 0.5:
                        continue
                    pm, gm = fm[b, d], gmasks[b, g]
                    union = np.logical_or(pm, gm).sum()
                    if union == 0:
                        continue
                    tot += np.logical_and(pm, gm).sum() / union
                    cnt += 1
        return (tot / cnt if cnt else 0.0), cnt

    map_before = eval_map(params, test_frames)
    print(f"[selfcheck-det] mAP@50 before: {map_before:.4f}", flush=True)
    t0 = time.time()
    first = last = None
    if args.device_train:
        # corpus -> HBM once; gather + augment + loss + update is one
        # jitted program, loss fetched only at print points (the host-aug
        # path round-trips numpy augmentation every step on 1 core)
        from embodied_captioning_tpu.ops.augment import augment_batch

        data_rgb = jnp.stack([jnp.asarray(f[0]) for f in train_frames])
        data_det = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[f[1] for f in train_frames])
        aug_kw = dict(crop=args.augment_crop, flip=True, jitter=True)

        # the corpus must be an ARGUMENT, not a closure capture: captured
        # device arrays become compile-time constants embedded in the HLO,
        # and the axon remote-compile request then ships the whole ~GB
        # corpus to the compiler (HTTP 413)
        @jax.jit
        def dev_step(params, ema_p, opt_state, idx, key, data_rgb, data_det):
            images = data_rgb[idx]
            gt = jax.tree_util.tree_map(lambda x: x[idx], data_det)
            if args.augment:
                images, gt = augment_batch(key, images, gt, **aug_kw)
            (loss, _), grads = jax.value_and_grad(
                lambda p: DET.detector_loss(p, images, gt, dcfg,
                                            head=args.head),
                has_aux=True)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if args.ema > 0:
                ema_p = jax.tree_util.tree_map(
                    lambda e, p: e * args.ema + p * (1.0 - args.ema),
                    ema_p, params)
            return params, ema_p, opt_state, loss

        key = jax.random.PRNGKey(args.seed + 7)
        ema_params = params
        for s in range(args.steps):
            idx = jnp.asarray(rng.choice(len(train_frames), args.batch,
                                         replace=False))
            key, sub = jax.random.split(key)
            params, ema_params, opt_state, loss = dev_step(
                params, ema_params, opt_state, idx, sub, data_rgb, data_det)
            if s == 0 or s % 50 == 0 or s == args.steps - 1:
                l = float(loss)
                first = first if first is not None else l
                last = l
                if s % 50 == 0:
                    print(f"  step {s}: loss={l:.3f}", flush=True)
    else:
        for s in range(args.steps):
            idx = rng.choice(len(train_frames), args.batch, replace=False)
            images, gt = batch_of(train_frames, idx, augment=args.augment)
            params, opt_state, loss = step_fn(params, opt_state, images, gt)
            loss = float(loss)
            first = first if first is not None else loss
            last = loss
            if s % 50 == 0:
                print(f"  step {s}: loss={loss:.3f}", flush=True)
    map_after = eval_map(params, test_frames)
    map_ema = (eval_map(ema_params, test_frames)
               if args.device_train and args.ema > 0 else None)
    map_tta = eval_map(params, test_frames, tta=True) if args.tta else None
    map_ema_tta = (eval_map(ema_params, test_frames, tta=True)
                   if args.tta and map_ema is not None else None)
    wide = {}
    if wide_frames is not None:
        wide["map50_wide"] = round(eval_map(params, wide_frames), 4)
        if args.device_train and args.ema > 0:
            wide["map50_wide_ema"] = round(eval_map(ema_params, wide_frames),
                                           4)
        if args.tta:
            wide["map50_wide_tta"] = round(
                eval_map(params, wide_frames, tta=True), 4)
            if args.device_train and args.ema > 0:
                wide["map50_wide_ema_tta"] = round(
                    eval_map(ema_params, wide_frames, tta=True), 4)
        wide["eval_wide_sha"] = corpus_checksum(wide_frames)
    map_train = eval_map(params, train_frames[: len(test_frames)])
    mask_iou, mask_n = eval_mask_iou(params, train_frames[: len(test_frames)])
    print(json.dumps({
        "seed": args.seed,
        "map50_after_ema": (round(map_ema, 4) if map_ema is not None
                            else None),
        "map50_after_tta": (round(map_tta, 4) if map_tta is not None
                            else None),
        "map50_after_ema_tta": (round(map_ema_tta, 4)
                                if map_ema_tta is not None else None),
        "eval_sha": (corpus_checksum(test_frames)
                     if args.split == "scenes" else None),
        "frames": len(train_frames), "steps": args.steps,
        "first_loss": round(first, 3), "last_loss": round(last, 3),
        "map50_before": round(map_before, 4),
        "map50_after": round(map_after, 4),
        "map50_train": round(map_train, 4),
        "mask_iou": round(float(mask_iou), 4),
        "mask_matched": mask_n,
        "train_seconds": round(time.time() - t0, 1),
        **wide,
    }))


if __name__ == "__main__":
    main()
