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


def collect(cfg, episodes, steps_per_ep, seed0, rng, chunk=None,
            skip_seeds=()):
    """`skip_seeds` = (start, n): scene seeds in [start, start+n) are
    remapped to start+n.. — used by the scenes split so a TRAINING pool
    larger than the eval block's first seed can never include the fixed
    eval scenes (<=start-scene runs are bit-identical with or without).

    `chunk` defaults to an HBM-adaptive size: at 1280^2 sensors (the
    serving-artifact rungs render at the serving sensor resolution) the
    per-frame full-res f32 instance masks inside the render+resize
    program are ~105 MB, so 32-frame chunks no longer fit."""
    if chunk is None:
        # budget ~1.5 GB of transient full-res f32 instance masks per
        # launch (the largest tensor inside render+resize); fewer, larger
        # launches matter through the tunnel, whose per-launch latency
        # drifts into the seconds range
        px = cfg.sensors.height * cfg.sensors.width
        n_det = cfg.detector.max_detections
        chunk = max(4, min(32, int(1.5e9 / (px * n_det * 4))))
    return _collect(cfg, episodes, steps_per_ep, seed0, rng, chunk,
                    skip_seeds)


def _collect(cfg, episodes, steps_per_ep, seed0, rng, chunk, skip_seeds):
    """Batched collection at DETECTOR scale: walk all sims on host first,
    then render (scene, pose) pairs in chunked `render_batch` launches;
    rgb/boxes/masks are resized to detector resolution ON DEVICE (masks to
    uint8) before the one fetch per chunk. Through the tunnel this is ~20x
    fewer round trips AND ~13x fewer bytes than per-frame observe()+
    full-res f32 masks (which measured ~10 GB for a 2.4k-frame ladder)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from embodied_captioning_tpu.envs.sim import (
        RaycastSim, gt_detections, render, resolve_attr_mode,
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
    mode = resolve_attr_mode(None, sensor, cfg.sensors.width)
    scale = size / sensor

    @jax.jit
    def render_chunk(scenes, poses):
        # render + GT + resize per FRAME under lax.map, not vmap: at
        # 1280^2 sensors the one-hot renderer's [H, W, 96] slab tensors
        # are ~0.6 GB/frame (twice-materialized) and the full-res f32
        # instance masks another ~105 MB/frame — a 14-frame vmap OOMs
        # 16 GB HBM at compile. Sequential per-frame bodies peak at ONE
        # frame while the chunk still ships as ONE launch (launch count,
        # not device FLOPs, dominates through the tunnel).
        def per_frame(args):
            scene, pose = args
            out = render(scene, pose, sensor, cfg.sensors.width,
                         cfg.sensors.hfov_deg, cfg.sensors.max_depth, mode)
            det = gt_detections(out["instances"], out["classes"],
                                max_instances=n_det, min_pixels=min_px)
            rgb = out["rgb"]
            if sensor != size:
                rgb = jnp.clip(resize_bilinear(rgb.astype(jnp.float32),
                                               size, size),
                               0, 255).astype(jnp.uint8)
                det = det.replace(boxes=det.boxes * scale)
            else:
                rgb = jnp.clip(rgb, 0, 255).astype(jnp.uint8)
            m = jnp.transpose(det.masks, (1, 2, 0))      # [H, W, N]
            m = resize_bilinear(m, size, size) >= 0.5
            return rgb, det.replace(
                masks=jnp.transpose(m, (2, 0, 1)).astype(jnp.uint8))

        return jax.lax.map(per_frame, (scenes, poses))

    import time as _time

    frames = []
    t0 = _time.time()
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
        if i // chunk % 32 == 31:
            rate = len(frames) / (_time.time() - t0)
            print(f"  [collect] {len(frames)}/{len(jobs)} frames "
                  f"({rate:.1f}/s)", flush=True)
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
    # materialize each key ONCE: NpzFile re-decompresses the whole member
    # on every [] access, which turns a per-frame comprehension into
    # O(frames) full decompressions of multi-GB arrays
    a = {k: z[k] for k in ("rgb", "boxes", "classes", "scores", "logits",
                           "valid", "masks")}
    return [(a["rgb"][i], Detections(
        boxes=a["boxes"][i], classes=a["classes"][i], scores=a["scores"][i],
        logits=a["logits"][i], valid=a["valid"][i], masks=a["masks"][i]))
        for i in range(a["rgb"].shape[0])]


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
    ap.add_argument("--eval-serving", action="store_true",
                    help="also report unseen-scene mAP under the SERVING "
                         "inference config (pre_nms_topk=1024, "
                         "num_proposals=128) with approx_max_k RPN top-k "
                         "both ON and OFF — the trained-weight validation "
                         "of the approx_topk serving knob")
    ap.add_argument("--calibrate", action="store_true",
                    help="calibrate the GN-trained weights to frozen "
                         "per-channel affine norm (FrozenBN semantics, "
                         "models/detector.calibrate_affine), then report "
                         "mAP of the affine artifact AND of the full "
                         "serving transform (calibrate -> fold_affine -> "
                         "int8) — the exact params a serving bench runs")
    ap.add_argument("--ckpt", default=None,
                    help="mid-run checkpoint pickle (device-train path): "
                         "params/EMA/opt-state/RNG saved every "
                         "--ckpt-every steps and auto-resumed when the "
                         "file exists — long rungs survive the tunnel's "
                         "outage waves")
    ap.add_argument("--ckpt-every", type=int, default=4000)
    ap.add_argument("--affine-finetune", type=int, default=0,
                    help="after --calibrate: N train steps under the "
                         "frozen affine norm (re-adapts weights to the "
                         "calibration statistics; closes the GN->affine "
                         "quality tax, VERDICT r4 next #3). The "
                         "fine-tuned affine weights are served when they "
                         "eval at least as well")
    ap.add_argument("--pack-masks", action="store_true",
                    help="bit-pack the device-train corpus masks in HBM "
                         "(8x smaller; at 256^2 x 512 scenes the uint8 "
                         "masks alone are ~8.6 GB). Unpacked on device "
                         "after the batch gather — exact")
    ap.add_argument("--scan-steps", type=int, default=1,
                    help="fuse K train steps into ONE device launch via "
                         "lax.scan (device-train path). Per-launch tunnel "
                         "RPC latency dominates the 70 ms/step observed at "
                         "the serving config; K=50 makes training "
                         "device-bound again")
    ap.add_argument("--train-cache", default=None,
                    help="npz path for the TRAINING corpus: first run "
                         "collects and saves, later seeds load identical "
                         "bytes. Repeat-seed rungs then vary ONLY init/"
                         "batch-order/augmentation (the walk poses come "
                         "from the first run's seed); collection through "
                         "the tunnel is minutes-to-hours at 1280^2 sensors")
    ap.add_argument("--save", default=None,
                    help="pickle the trained artifact here: raw + EMA "
                         "params, calibrated-affine params (with "
                         "--calibrate), train/serving detector configs — "
                         "bench.py loads it via BENCH_DETECTOR_WEIGHTS")
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
        if args.train_cache and os.path.exists(args.train_cache):
            train_frames = load_corpus(args.train_cache)
            print(f"[selfcheck-det] train corpus loaded from "
                  f"{args.train_cache}", flush=True)
        else:
            train_frames = collect(cfg, args.episodes, 16, 0, rng,
                                   skip_seeds=(args.eval_seed,
                                               args.eval_scenes))
            if args.train_cache:
                save_corpus(args.train_cache, train_frames)
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

    def eval_map(params, frames, tta=False, cfg_=None):
        fwd = (functools.partial(DET.forward_tta, with_masks=False) if tta
               else functools.partial(DET.forward, with_masks=False))
        preds, gts = [], []
        for i in range(0, len(frames) - args.batch + 1, args.batch):
            images, gt = batch_of(frames, range(i, i + args.batch))
            det = fwd(params, images, cfg_ or eval_cfg)
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
        if args.pack_masks:
            # host-side bitpack [F,N,S,S] u8 -> [F,N,S,S/8]; the device
            # unpacks after the per-batch gather (shift-and-mask, exact)
            packed = np.stack([np.packbits(
                np.asarray(f[1].masks, np.uint8), axis=-1,
                bitorder="little") for f in train_frames])
            data_det = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs),
                *[f[1].replace(masks=np.zeros((0,))) for f in train_frames])
            data_det = data_det.replace(masks=jnp.asarray(packed))
        else:
            data_det = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *[f[1] for f in train_frames])
        aug_kw = dict(crop=args.augment_crop, flip=True, jitter=True)

        def unpack_masks(pk):
            bits = (pk[..., None] >> jnp.arange(8, dtype=jnp.uint8)) & 1
            return bits.reshape(*pk.shape[:-1], pk.shape[-1] * 8)

        # the corpus must be an ARGUMENT, not a closure capture: captured
        # device arrays become compile-time constants embedded in the HLO,
        # and the axon remote-compile request then ships the whole ~GB
        # corpus to the compiler (HTTP 413)
        @jax.jit
        def dev_step(params, ema_p, opt_state, idx, key, data_rgb, data_det):
            images = data_rgb[idx]
            gt = jax.tree_util.tree_map(lambda x: x[idx], data_det)
            if args.pack_masks:
                gt = gt.replace(masks=unpack_masks(gt.masks))
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

        @jax.jit
        def dev_scan(params, ema_p, opt_state, idxs, keys, data_rgb,
                     data_det):
            def body(carry, xs):
                p, e, o = carry
                idx, k = xs
                p, e, o, loss = dev_step.__wrapped__(p, e, o, idx, k,
                                                     data_rgb, data_det)
                return (p, e, o), loss

            (params, ema_p, opt_state), losses = jax.lax.scan(
                body, (params, ema_p, opt_state), (idxs, keys))
            return params, ema_p, opt_state, losses

        key = jax.random.PRNGKey(args.seed + 7)
        ema_params = params
        k_scan = max(1, args.scan_steps)
        s = 0
        if args.ckpt and os.path.exists(args.ckpt):
            import pickle as _pkl

            with open(args.ckpt, "rb") as fh:
                ck = _pkl.load(fh)
            params = jax.tree_util.tree_map(jnp.asarray, ck["params"])
            ema_params = jax.tree_util.tree_map(jnp.asarray, ck["ema"])
            opt_state = jax.tree_util.tree_map(
                lambda x: jnp.asarray(x) if hasattr(x, "shape") else x,
                ck["opt_state"])
            key = jnp.asarray(ck["key"])
            rng.bit_generator.state = ck["rng_state"]
            s = ck["step"]
            print(f"[selfcheck-det] resumed from {args.ckpt} at step {s}",
                  flush=True)

        def save_ckpt(step_now):
            import pickle as _pkl

            host = lambda t: jax.tree_util.tree_map(np.asarray, t)  # noqa
            tmp = args.ckpt + ".tmp"
            with open(tmp, "wb") as fh:
                _pkl.dump({"step": step_now, "params": host(params),
                           "ema": host(ema_params),
                           "opt_state": host(opt_state),
                           "key": np.asarray(key),
                           "rng_state": rng.bit_generator.state}, fh)
            os.replace(tmp, args.ckpt)
            print(f"[selfcheck-det] checkpoint @ step {step_now}",
                  flush=True)

        while s < args.steps:
            k = min(k_scan, args.steps - s)
            if k == 1:
                idx = jnp.asarray(rng.choice(len(train_frames), args.batch,
                                             replace=False))
                key, sub = jax.random.split(key)
                params, ema_params, opt_state, loss = dev_step(
                    params, ema_params, opt_state, idx, sub, data_rgb,
                    data_det)
                losses = loss[None] if hasattr(loss, "shape") else [loss]
            else:
                idxs = jnp.asarray(np.stack([
                    rng.choice(len(train_frames), args.batch, replace=False)
                    for _ in range(k)]))
                key, *subs = jax.random.split(key, k + 1)
                params, ema_params, opt_state, losses = dev_scan(
                    params, ema_params, opt_state, idxs, jnp.stack(subs),
                    data_rgb, data_det)
            if s == 0 or (s // 50) != ((s + k) // 50) or s + k >= args.steps:
                l = float(losses[-1])
                first = first if first is not None else float(losses[0])
                last = l
                print(f"  step {s + k - 1}: loss={l:.3f}", flush=True)
            if (args.ckpt and args.ckpt_every
                    and (s // args.ckpt_every) != ((s + k)
                                                   // args.ckpt_every)):
                save_ckpt(s + k)
            s += k
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
    # --- serving-config evaluation on the SAME trained weights -----------
    # (VERDICT r3 missing #1 / weak #1: the serving inference knobs —
    # 1024 pre-NMS, 128 ROIs, approx_max_k top-k — and the serving norm
    # transform had only ever run on random weights)
    # serve the better of raw/EMA as measured on this corpus (short runs
    # leave a 0.999-decay EMA still near init)
    best_p = (ema_params if (map_ema is not None and map_ema >= map_after)
              else params)
    serving = {}
    if args.eval_serving:
        s_exact = _dc.replace(eval_cfg, pre_nms_topk=1024,
                              num_proposals=128, approx_topk=False)
        s_approx = _dc.replace(s_exact, approx_topk=True)
        serving["map50_serving_exact"] = round(
            eval_map(best_p, test_frames, cfg_=s_exact), 4)
        serving["map50_serving_approx"] = round(
            eval_map(best_p, test_frames, cfg_=s_approx), 4)
        # GN-norm int8 serving variant: at sub-512^2 inputs the GroupNorm
        # passes are a small fraction of the fused program, so serving GN
        # weights directly (quantized, approx top-k) can be the best
        # quality/fps artifact — measured alongside the affine transform
        from embodied_captioning_tpu.models.quantize import quantize_params

        serving["map50_gn_int8"] = round(
            eval_map(quantize_params(best_p, min_size=64), test_frames,
                     cfg_=s_approx), 4)
    affine_art = None
    if args.calibrate:
        from embodied_captioning_tpu.models.quantize import quantize_params

        calib = [batch_of(train_frames, range(i, i + args.batch))[0]
                 for i in range(0, min(8 * args.batch, len(train_frames)
                                       - args.batch + 1), args.batch)]
        affine_art = DET.calibrate_affine(best_p, calib, dcfg)
        aff_cfg = _dc.replace(eval_cfg, norm="affine")
        serving["map50_affine"] = round(
            eval_map(affine_art, test_frames, cfg_=aff_cfg), 4)
        if args.affine_finetune > 0:
            # affine-NATIVE fine-tune (VERDICT r4 weak #2 / next #3):
            # calibration is exact only where calibration statistics match
            # per-image GN statistics; a short fine-tune under the frozen
            # affine norm re-adapts the weights to those statistics (the
            # detectron2 FrozenBN recipe — train briefly with the norm you
            # serve, ref: multi_stage_models.py:254-330)
            aff_train_cfg = _dc.replace(dcfg, norm="affine")
            ft_steps = args.affine_finetune
            sched_a = optax.warmup_cosine_decay_schedule(
                0.0, args.lr / 10, min(50, ft_steps // 5), ft_steps,
                args.lr / 200)
            opt_a = optax.chain(optax.clip_by_global_norm(5.0),
                                optax.adam(sched_a))
            opt_a_state = opt_a.init(affine_art)

            @jax.jit
            def aff_step(params, opt_state, images, gt):
                (loss, _), grads = jax.value_and_grad(
                    lambda p: DET.detector_loss(p, images, gt, aff_train_cfg,
                                                head=args.head),
                    has_aux=True)(params)
                updates, opt_state = opt_a.update(grads, opt_state, params)
                return optax.apply_updates(params, updates), opt_state, loss

            aft = affine_art
            for s_ in range(ft_steps):
                idx = rng.choice(len(train_frames), args.batch,
                                 replace=False)
                images, gt = batch_of(train_frames, idx,
                                      augment=args.augment)
                aft, opt_a_state, aloss = aff_step(aft, opt_a_state, images,
                                                   gt)
                if s_ % 100 == 0:
                    print(f"  [affine-ft] step {s_}: "
                          f"loss={float(aloss):.3f}", flush=True)
            m_ft = eval_map(aft, test_frames, cfg_=aff_cfg)
            serving["map50_affine_ft"] = round(m_ft, 4)
            if m_ft >= serving["map50_affine"]:
                affine_art = aft  # serve the fine-tuned affine weights
        served_cfg = _dc.replace(aff_cfg, pre_nms_topk=1024,
                                 num_proposals=128, approx_topk=True)
        served = quantize_params(DET.fold_affine(affine_art, served_cfg),
                                 min_size=64)
        serving["map50_served_int8"] = round(
            eval_map(served, test_frames, cfg_=served_cfg), 4)
        if args.tta:
            serving["map50_served_int8_tta"] = round(
                eval_map(served, test_frames, tta=True, cfg_=served_cfg), 4)
    if args.save:
        import pickle

        from embodied_captioning_tpu.config import to_dict as _cfg_dict

        host = lambda t: jax.tree_util.tree_map(np.asarray, t)  # noqa: E731
        art = {
            "params": host(params),
            "ema": (host(ema_params)
                    if args.device_train and args.ema > 0 else None),
            "best": ("ema" if best_p is not params else "raw"),
            "affine": host(affine_art) if affine_art is not None else None,
            "train_cfg": _cfg_dict(dcfg),
            "serving_cfg": _cfg_dict(_dc.replace(
                dcfg, norm=("affine" if affine_art is not None else dcfg.norm),
                pre_nms_topk=1024, num_proposals=128, approx_topk=True)),
            "recipe": vars(args),
        }
        with open(args.save, "wb") as fh:
            pickle.dump(art, fh)
        print(f"[selfcheck-det] artifact saved to {args.save}", flush=True)

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
        **serving,
    }))


if __name__ == "__main__":
    main()
