#!/usr/bin/env python
"""Teacher-student improvement proof at the detector protocol scale
(VERDICT r3 missing #3): a protocol-trained TEACHER pseudo-labels an
UNLABELED scene pool through each consensus mode (vanilla / soft /
semantic_map), a STUDENT trains from scratch on those pseudo-labels with
the matching loss head, and both are evaluated on the FIXED checksummed
unseen-scene corpus — one table row per consensus mode, measured.

Ref: experimenting_env/pipelines.py:322-581 TeacherStudent (teacher =
ConsensusLabeler(MultiStageModel), student loss head per consensus mode),
detector/pseudolabeler.py consensus family. Association parity: the
reference matches predictions to instance ids via box IoU against the
frame's labels (utils/matching.py:17-43 thr 0.3); here the unlabeled
pool's GT ids serve only that association role (never as labels), and the
semantic_map mode needs no ids at all — the voxel map groups in 3D.

Usage:
  python scripts/selfcheck_teacher_student.py --teacher /tmp/det_proto.pkl \
      [--modes vanilla,soft,semantic_map] [--scenes 128] [--steps 12000]
The teacher artifact comes from scripts/selfcheck_detector.py --save at
the protocol recipe.
"""

import argparse
import dataclasses
import functools
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def collect_with_pose(cfg, episodes, steps_per_ep, seed0, rng, chunk=24):
    """Like selfcheck_detector.collect but keeps depth + camera pose per
    frame (the semantic_map consensus fuses in 3D) and the GT detections
    (association ids + pseudo-label quality reporting only)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from embodied_captioning_tpu.envs.sim import (
        RaycastSim, gt_detections, render_batch,
    )
    from embodied_captioning_tpu.ops.image import resize_bilinear

    sims, jobs = [], []
    for ep in range(episodes):
        sim = RaycastSim(cfg.sim, cfg.sensors, seed=seed0 + ep)
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
        rgb, depth = out["rgb"], out["depth"]
        if sensor != size:
            rgb = jnp.clip(resize_bilinear(rgb.astype(jnp.float32), size,
                                           size), 0, 255).astype(jnp.uint8)
            depth = depth[:, ::sensor // size, ::sensor // size]
            dets = dets.replace(boxes=dets.boxes * scale)
        m = jnp.transpose(dets.masks, (0, 2, 3, 1))
        m = resize_bilinear(m, size, size) >= 0.5
        masks = jnp.transpose(m, (0, 3, 1, 2)).astype(jnp.uint8)
        return rgb, depth, dets.replace(masks=masks)

    frames = []
    for i in range(0, len(jobs), chunk):
        part = jobs[i:i + chunk]
        scenes = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[sims[e].scene for e, _ in part])
        poses = jnp.asarray(np.stack([p for _, p in part]))
        rgb, depth, dets = render_chunk(scenes, poses)
        rgb, depth = np.asarray(rgb), np.asarray(depth)
        dets = jax.tree_util.tree_map(np.asarray, dets)
        for b in range(len(part)):
            ep, pose = part[b]
            frames.append({
                "episode": ep, "rgb": rgb[b], "depth": depth[b],
                "pose": pose,
                "gt": jax.tree_util.tree_map(lambda x: x[b], dets)})
    return frames


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--teacher", required=True,
                    help="pickle artifact from selfcheck_detector --save")
    ap.add_argument("--modes", default="vanilla,soft,semantic_map",
                    help="consensus modes; semantic_map_hybrid = raytraced "
                         "3D-consistent classes/logits with the teacher's "
                         "frame-level masks+boxes grafted onto matched "
                         "instances (VERDICT r4 weak #3 diagnosis arm), "
                         "semantic_map_fine = 2.5 cm raytrace voxels")
    ap.add_argument("--generations", type=int, default=1,
                    help=">1 iterates the reference's loop: the gen-k "
                         "student becomes the gen-(k+1) teacher, re-labels "
                         "the SAME pool, and a fresh student trains "
                         "(ref: pipelines.py:861-877 'the process can "
                         "start again with a new iteration')")
    ap.add_argument("--scenes", type=int, default=128,
                    help="unlabeled scene pool (seeds 2000.. — disjoint "
                         "from the teacher's 0..~520 train pool and the "
                         "500.. eval block)")
    ap.add_argument("--pool-seed", type=int, default=2000)
    ap.add_argument("--steps", type=int, default=12000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--eval-cache", default="/tmp/det_eval_corpus_128px.npz")
    ap.add_argument("--teacher-threshold", type=float, default=0.5)
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from embodied_captioning_tpu.config import load_config, merge
    from embodied_captioning_tpu.labeling.datasets import Sample
    from embodied_captioning_tpu.labeling.pseudolabeler import (
        SemanticMapConsensusLabeler, SoftConsensusLabeler,
        VanillaConsensusLabeler,
    )
    from embodied_captioning_tpu.mapping.matching import IdAllocator
    from embodied_captioning_tpu.models import detector as DET
    from embodied_captioning_tpu.ops.detections import (
        Detections, pairwise_iou,
    )
    from embodied_captioning_tpu.utils.metrics import evaluate_detections
    from selfcheck_detector import (
        collect, corpus_checksum, load_corpus, save_corpus,
    )

    with open(args.teacher, "rb") as fh:
        art = pickle.load(fh)
    cfg = load_config("tiny", overrides=list(args.overrides))
    cfg = merge(cfg, {"detector": art["train_cfg"],
                      # full-size voxel map: the tiny preset's 64^3-at-5cm
                      # grid covers 3.2 m, the scenes are 12 m — the
                      # semantic_map consensus must fuse the whole room
                      "map": {"grid": (256, 64, 256), "max_objects": 128}})
    dcfg = cfg.detector
    best = art.get("ema") if art.get("best") == "ema" else None
    teacher = jax.tree_util.tree_map(jnp.asarray, best or art["params"])
    rng = np.random.default_rng(args.seed)
    size = dcfg.image_size

    # ---- fixed eval corpus (identical bytes across every row) -----------
    if os.path.exists(args.eval_cache):
        test_frames = load_corpus(args.eval_cache)
    else:
        test_frames = collect(cfg, 8, 12, 500, np.random.default_rng(500))
        save_corpus(args.eval_cache, test_frames)
    eval_sha = corpus_checksum(test_frames)
    print(f"[ts] eval corpus {len(test_frames)} frames sha {eval_sha}",
          flush=True)

    eval_cfg = dataclasses.replace(dcfg, score_threshold=0.05)

    def eval_map(params):
        preds, gts = [], []
        for i in range(0, len(test_frames) - args.batch + 1, args.batch):
            images = jnp.asarray(np.stack(
                [test_frames[i + b][0] for b in range(args.batch)]))
            det = DET.forward(params, images, eval_cfg, with_masks=False)
            for b in range(args.batch):
                preds.append(Detections(
                    boxes=det.boxes[b], classes=det.classes[b],
                    scores=det.scores[b], logits=det.logits[b],
                    valid=det.valid[b]))
                gts.append(test_frames[i + b][1])
        return evaluate_detections(preds, gts, dcfg.num_classes)["map"]

    teacher_map = eval_map(teacher)
    print(f"[ts] teacher unseen mAP@50 {teacher_map:.4f}", flush=True)

    # ---- unlabeled pool + teacher predictions ---------------------------
    t0 = time.time()
    pool = collect_with_pose(cfg, args.scenes, 16, args.pool_seed, rng)
    print(f"[ts] pool {len(pool)} frames ({time.time() - t0:.0f}s)",
          flush=True)
    t_cfg = dataclasses.replace(dcfg,
                                score_threshold=args.teacher_threshold)
    paste = jax.jit(lambda det: DET.full_masks(det, size),
                    static_argnames=())

    def label_pool(teacher_params):
        """Predict the pool with `teacher_params` + association ids (IoU vs
        the pool's GT instances — the reference's matching role for bbsgt,
        never the labels)."""
        alloc = IdAllocator()
        out = []
        for i in range(0, len(pool), args.batch):
            part = pool[i:i + args.batch]
            images = jnp.asarray(np.stack([f["rgb"] for f in part]))
            det = DET.forward(teacher_params, images, t_cfg, with_masks=True)
            fmasks = np.asarray(paste(det) > 0.5)
            for b, f in enumerate(part):
                n = det.valid.shape[1]
                pred = Sample(
                    image=f["rgb"], boxes=np.array(det.boxes[b]),
                    classes=np.array(det.classes[b]),
                    logits=np.array(det.logits[b]),
                    masks=fmasks[b].astype(np.float32),
                    valid=np.array(det.valid[b]),
                    scores=np.array(det.scores[b]),
                    object_ids=np.full((n,), -1, np.int64),
                    episode=int(f["episode"]), step=i + b,
                    depth=f["depth"], pose=f["pose"])
                gt = f["gt"]
                iou = np.asarray(pairwise_iou(
                    jnp.asarray(pred.boxes), jnp.asarray(gt.boxes)))
                iou = iou * np.asarray(gt.valid)[None, :]
                gt_ids = np.asarray(gt.object_ids) if hasattr(
                    gt, "object_ids") and gt.object_ids is not None else None
                for j in np.nonzero(pred.valid)[0]:
                    k = int(np.argmax(iou[j])) if iou.shape[1] else 0
                    if iou.shape[1] and iou[j, k] > 0.3:
                        base = (gt_ids[k] if gt_ids is not None else k)
                        pred.object_ids[j] = f["episode"] * 1000 + int(base)
                    else:
                        pred.object_ids[j] = 5_000_000 + alloc.take(1)[0]
                out.append(pred)
        return out

    t0 = time.time()
    samples = label_pool(teacher)
    n_pred = int(sum(s.valid.sum() for s in samples))
    print(f"[ts] teacher labeled {n_pred} detections over {len(samples)} "
          f"frames ({time.time() - t0:.0f}s)", flush=True)

    # ---- per-mode: consensus -> student train -> eval -------------------
    from embodied_captioning_tpu.ops.augment import augment_batch

    def samples_to_corpus(pseudo):
        rgb = jnp.stack([jnp.asarray(s.image) for s in pseudo])
        det = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *[
            Detections(
                boxes=jnp.asarray(s.boxes, jnp.float32),
                classes=jnp.asarray(s.classes, jnp.int32),
                scores=jnp.asarray(s.scores if s.scores is not None
                                   else s.valid, jnp.float32),
                logits=jnp.asarray(s.logits, jnp.float32),
                valid=jnp.asarray(s.valid, bool),
                masks=jnp.asarray(np.asarray(s.masks) > 0.5, jnp.uint8))
            for s in pseudo])
        return rgb, det

    def train_student(pseudo, head):
        params = DET.init_detector(jax.random.PRNGKey(args.seed + 1), dcfg)
        sched = optax.warmup_cosine_decay_schedule(
            0.0, args.lr, min(500, args.steps // 10), args.steps,
            args.lr / 20)
        opt = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(sched))
        opt_state = opt.init(params)
        data_rgb, data_det = samples_to_corpus(pseudo)

        @jax.jit
        def dev_step(params, opt_state, idx, key, data_rgb, data_det):
            images = data_rgb[idx]
            gt = jax.tree_util.tree_map(lambda x: x[idx], data_det)
            images, gt = augment_batch(key, images, gt, crop=True,
                                       flip=True, jitter=True)
            (loss, _), grads = jax.value_and_grad(
                lambda p: DET.detector_loss(p, images, gt, dcfg, head=head),
                has_aux=True)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        key = jax.random.PRNGKey(args.seed + 7)
        n = int(data_rgb.shape[0])
        for s in range(args.steps):
            idx = jnp.asarray(rng.choice(n, args.batch, replace=False))
            key, sub = jax.random.split(key)
            params, opt_state, loss = dev_step(params, opt_state, idx, sub,
                                               data_rgb, data_det)
            if s % 2000 == 0:
                print(f"  [{head}] step {s}: loss={float(loss):.3f}",
                      flush=True)
        return params

    def clone_samples(src, subset=None):
        return [Sample(
            image=s.image, boxes=s.boxes.copy(), classes=s.classes.copy(),
            logits=s.logits.copy(), masks=s.masks, valid=s.valid.copy(),
            scores=(s.scores.copy() if s.scores is not None else None),
            object_ids=s.object_ids.copy(), episode=s.episode, step=s.step,
            depth=s.depth, pose=s.pose) for s in (subset or src)]

    # consensus stages never call predict(), so no Perceiver is needed —
    # a truthy sentinel skips the base class's eager construction
    _NO_PERCEIVER = object()

    def graft_frame_masks(pseudo, src):
        """semantic_map_hybrid: keep the raytraced consensus CLASSES/LOGITS
        (3D-consistent identity) but graft the teacher's frame-level
        masks+boxes onto matched instances (box IoU > 0.3) — raytraced 5 cm
        masks lose box/mask fidelity (round-4 diagnosis, docs/BENCH.md);
        unmatched pseudo-instances keep the raytraced geometry."""
        by_key = {(s.episode, s.step): s for s in src}
        for p in pseudo:
            s = by_key.get((p.episode, p.step))
            if s is None or not s.valid.any():
                continue
            iou = np.asarray(pairwise_iou(jnp.asarray(p.boxes),
                                          jnp.asarray(s.boxes)))
            iou = iou * s.valid[None, :]
            for j in np.nonzero(p.valid)[0]:
                k = int(np.argmax(iou[j])) if iou.shape[1] else 0
                if iou.shape[1] and iou[j, k] > 0.3:
                    p.boxes[j] = s.boxes[k]
                    p.masks[j] = s.masks[k]
        return pseudo

    def consensus(mode, src):
        """Consensus-labeled pseudo dataset + the matching student head."""
        if mode == "vanilla":
            return VanillaConsensusLabeler(
                cfg, perceiver=_NO_PERCEIVER).get_pseudo_labels(
                    clone_samples(src)), "ce"
        if mode == "soft":
            return SoftConsensusLabeler(
                cfg, perceiver=_NO_PERCEIVER).get_pseudo_labels(
                    clone_samples(src)), "soft"
        if mode in ("semantic_map", "semantic_map_hybrid",
                    "semantic_map_fine"):
            c = cfg
            if mode == "semantic_map_fine":
                # 2.5 cm raytrace voxels (2x finer masks; grid doubled to
                # keep the same 12.8 m coverage). ~2.4 GB of map state —
                # viable only because maps are per-episode sequential
                c = merge(cfg, {"map": {"voxel_size": 0.025,
                                        "grid": (512, 128, 512)}})
            # one full-size voxel map per episode: fuse + raytrace each
            # episode's frames in turn and FREE the map before the next —
            # 128 concurrent full maps exhaust the 16 GB chip
            pseudo = []
            by_ep = {}
            for s_ in src:
                by_ep.setdefault(s_.episode, []).append(s_)
            for ep in sorted(by_ep):
                lab = SemanticMapConsensusLabeler(c, perceiver=_NO_PERCEIVER)
                pseudo += lab.get_pseudo_labels(
                    clone_samples(src, by_ep[ep]))
                lab.global_maps.clear()
            if mode == "semantic_map_hybrid":
                pseudo = graft_frame_masks(pseudo, src)
            return pseudo, "ce"
        raise ValueError(mode)

    results = {"teacher_map50": round(teacher_map, 4),
               "eval_sha": eval_sha, "pool_frames": len(samples),
               "teacher_detections": n_pred, "steps": args.steps,
               "scenes": args.scenes, "generations": args.generations}
    for mode in args.modes.split(","):
        cur = samples  # gen-1 teacher labels (shared across modes)
        for gen in range(1, args.generations + 1):
            t0 = time.time()
            pseudo, head = consensus(mode, cur)
            pseudo = [p for p in pseudo if p.valid.any()]
            tag = (f"student_{mode}_map50" if gen == 1
                   else f"student_{mode}_gen{gen}_map50")
            if not pseudo:
                results[tag] = None
                break
            student = train_student(pseudo, head)
            m = eval_map(student)
            results[tag] = round(m, 4)
            print(f"[ts] mode={mode} gen={gen}: student unseen mAP@50 "
                  f"{m:.4f} ({time.time() - t0:.0f}s)", flush=True)
            if gen < args.generations:
                # the student becomes the next generation's teacher
                # (ref: pipelines.py:861-877) and re-labels the SAME pool
                cur = label_pool(student)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
