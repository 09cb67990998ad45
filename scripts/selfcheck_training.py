#!/usr/bin/env python
"""End-to-end learning self-check: train the captioner on simulator GT and
measure that captions become correct.

This is the framework's analog of the reference's fine-tune-then-evaluate
loop (BASELINE configs #3/#4: caption quality parity on a labeled test set)
run fully in-framework: RaycastSim renders labeled scenes, GT crops get
template captions ("a {color} {class}"), the captioner trains with
train/captioner_train.train_step, and held-out crops are scored by
class-word accuracy + sentence-cosine vs the reference captions.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_COLOR_WORDS = {
    (0.55, 0.27, 0.15): "brown", (0.13, 0.55, 0.13): "green",
    (0.66, 0.66, 0.86): "blue", (0.52, 0.37, 0.26): "brown",
    (0.92, 0.92, 0.95): "white", (0.08, 0.08, 0.1): "black",
}


def _color_word(albedo) -> str:
    import numpy as np

    r, g, b = [float(x) for x in albedo]
    if g > r and g > b:
        return "green"
    if r > 0.8 and g > 0.8 and b > 0.8:
        return "white"
    if r < 0.2 and g < 0.2 and b < 0.25:
        return "black"
    if b > r and b > g:
        return "blue"
    return "brown"


def collect(cfg, episodes, steps, seed0, max_crops):
    """GT caption crops over `episodes` scenes — batched: all walks happen
    on host first, then (scene, pose) chunks render+detect+crop in ONE
    launch each under lax.map (the detector corpus collector's shape;
    per-frame observe() RPCs made >1k-crop corpora hours-long through the
    tunnel, VERDICT r4 weak #6). Crop capacity 8/frame, filtered on host.
    """
    import functools as _ft

    import jax
    import jax.numpy as jnp
    import numpy as np

    from embodied_captioning_tpu.config import CLASS_NAMES
    from embodied_captioning_tpu.envs.sim import (
        RaycastSim, gt_detections, render, resolve_attr_mode,
    )
    from embodied_captioning_tpu.ops.detections import expand_boxes
    from embodied_captioning_tpu.ops.image import crop_and_resize

    size = cfg.captioner.vision.image_size
    sensor = cfg.sensors.height
    rng = np.random.default_rng(seed0)
    sims, jobs, albedos = [], [], []
    for ep in range(episodes):
        sim = RaycastSim(cfg.sim, cfg.sensors, seed=seed0 + ep)
        sims.append(sim)
        # composite furniture spans several boxes per instance id; the
        # FIRST box is the primary part (seat/mattress/top), so its albedo
        # names the object's color
        albedo_by_iid = {}
        for i, a in zip(np.asarray(sim.scene.instance_id),
                        np.asarray(sim.scene.albedo)):
            if i >= 0 and int(i) not in albedo_by_iid:
                albedo_by_iid[int(i)] = a
        albedos.append(albedo_by_iid)
        for _ in range(steps):
            for _ in range(int(rng.integers(2, 6))):
                sim.step(int(rng.integers(1, 4)))
            jobs.append((ep, np.asarray(sim.agent.camera_matrix(),
                                        np.float32)))

    min_px = max(50, (sensor * cfg.sensors.width) // 2184)
    mode = resolve_attr_mode(None, sensor, cfg.sensors.width)

    @jax.jit
    def render_chunk(scenes, poses):
        def per_frame(args):
            scene, pose = args
            out = render(scene, pose, sensor, cfg.sensors.width,
                         cfg.sensors.hfov_deg, cfg.sensors.max_depth, mode)
            det = gt_detections(out["instances"], out["classes"],
                                max_instances=8, min_pixels=min_px)
            eb = expand_boxes(det.boxes, 0.2, sensor, cfg.sensors.width)
            crops8 = crop_and_resize(out["rgb"].astype(jnp.float32), eb,
                                     size)
            return (jnp.clip(crops8, 0, 255).astype(jnp.uint8),
                    det.classes, det.object_ids, det.valid)

        return jax.lax.map(per_frame, (scenes, poses))

    # lax.map peaks at ONE frame's renderer slab regardless of chunk; the
    # chunk size only trades launch count against host-side stacking
    chunk = 16 if sensor >= 1024 else 64
    crops, caps, classes = [], [], []
    for i in range(0, len(jobs), chunk):
        part = jobs[i:i + chunk]
        scenes = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[sims[e].scene for e, _ in part])
        poses = jnp.asarray(np.stack([p for _, p in part]))
        c8, cls8, iid8, v8 = jax.tree_util.tree_map(
            np.asarray, render_chunk(scenes, poses))
        for b, (ep, _) in enumerate(part):
            for j in np.nonzero(v8[b])[0]:
                color = _color_word(albedos[ep].get(int(iid8[b, j]),
                                                    (0.5, 0.4, 0.3)))
                crops.append(c8[b, j])
                caps.append(f"a {color} {CLASS_NAMES[int(cls8[b, j])]}")
                classes.append(int(cls8[b, j]))
                if len(crops) >= max_crops:
                    return crops, caps, classes
    return crops, caps, classes


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="tiny")
    ap.add_argument("--train-crops", type=int, default=192)
    ap.add_argument("--train-scenes", type=int, default=6,
                    help="training scene pool (seeds 0..N-1; the detector "
                         "protocol trains on hundreds of scenes — the "
                         "captioner corpus scales the same way, VERDICT "
                         "r4 weak #6)")
    ap.add_argument("--train-steps-per-scene", type=int, default=12)
    ap.add_argument("--train-cache", default=None,
                    help="npz path for the train-crop corpus: collect once, "
                         "reuse across seeds (identical bytes)")
    ap.add_argument("--test-crops", type=int, default=32)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--scan-steps", type=int, default=1,
                    help="fuse K train steps per device launch (lax.scan "
                         "over device-resident corpus gathers) — per-launch "
                         "tunnel RPC latency otherwise dominates small "
                         "steps (the detector rungs' --scan-steps)")
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--speculative", action="store_true",
                    help="also time speculative vs greedy decode on the "
                         "trained model (exactness + fenced latency)")
    ap.add_argument("--seed", type=int, default=0,
                    help="training seed (init key + batch order). Scene "
                         "collection keys on its own seeds, so repeat-seed "
                         "runs measure training variance on identical "
                         "corpora — the detector protocol's discipline")
    ap.add_argument("--eval-seed", type=int, default=1000,
                    help="scene-seed origin of the UNSEEN-scene eval crops "
                         "(train scenes use seeds 0.., so >= 1000 cannot "
                         "leak)")
    ap.add_argument("--eval-scenes", type=int, default=3)
    ap.add_argument("--eval-cache", default=None,
                    help="npz path: save the eval crop corpus on first "
                         "run, load afterwards — repeat-seed rungs then "
                         "evaluate literally identical bytes (sha printed)")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from embodied_captioning_tpu.config import CLASS_NAMES, load_config
    from embodied_captioning_tpu.models.captioner import (
        generate, init_captioner,
    )
    from embodied_captioning_tpu.models.sbert import SentenceEncoder
    from embodied_captioning_tpu.models.tokenizer import default_tokenizer
    from embodied_captioning_tpu.train.captioner_train import (
        create_train_state, train_step,
    )
    from embodied_captioning_tpu.utils.metrics import caption_scores

    cfg = load_config(args.preset, overrides=list(args.overrides))
    t0 = time.time()
    if args.train_cache and os.path.exists(args.train_cache):
        z = np.load(args.train_cache, allow_pickle=False)
        tr_crops = list(z["crops"])
        tr_caps = [str(s) for s in z["caps"]]
        print(f"[selfcheck] train corpus loaded from {args.train_cache}",
              flush=True)
    else:
        tr_crops, tr_caps, _ = collect(cfg, args.train_scenes,
                                       args.train_steps_per_scene, 0,
                                       args.train_crops)
        if args.train_cache:
            np.savez_compressed(args.train_cache,
                                crops=np.stack(tr_crops),
                                caps=np.asarray(tr_caps))
    if args.eval_cache and os.path.exists(args.eval_cache):
        z = np.load(args.eval_cache, allow_pickle=False)
        te_crops = list(z["crops"])
        te_caps = [str(s) for s in z["caps"]]
        te_cls = [int(c) for c in z["classes"]]
    else:
        te_crops, te_caps, te_cls = collect(
            cfg, args.eval_scenes, 8, args.eval_seed, args.test_crops)
        if args.eval_cache:
            np.savez_compressed(
                args.eval_cache, crops=np.stack(te_crops),
                caps=np.asarray(te_caps), classes=np.asarray(te_cls))
    import hashlib

    h = hashlib.sha256()
    h.update(np.ascontiguousarray(np.stack(te_crops)))
    h.update("|".join(te_caps).encode())
    eval_sha = h.hexdigest()[:16]
    print(f"[selfcheck] {len(tr_crops)} train / {len(te_crops)} test crops "
          f"({time.time() - t0:.0f}s) eval_sha {eval_sha}", flush=True)
    if len(tr_crops) < args.batch or not te_crops:
        print(json.dumps({"error": "not enough crops"}))
        return

    assert args.eval_seed >= args.train_scenes, "eval scenes leak into train"
    ccfg = cfg.captioner
    tok = default_tokenizer(ccfg.text.vocab_size)
    params = init_captioner(jax.random.PRNGKey(args.seed), ccfg)
    state = create_train_state(params, lr=args.lr)
    tokens = tok.encode_batch(tr_caps, ccfg.text.context_length)
    images = np.stack(tr_crops)
    n = len(images)
    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    first = last = None
    step_times = []
    if args.scan_steps > 1:
        # device-resident corpus + K steps fused per launch: the corpus
        # ships once (jit ARG, not a captured constant — closure capture
        # embeds it in the HLO and the remote-compile request, CLAUDE.md),
        # indices [K, B] per launch, ONE loss readback per window
        import functools as _ft

        from embodied_captioning_tpu.train.captioner_train import (
            train_step as _ts,
        )

        @_ft.partial(jax.jit, static_argnames=("ccfg_", "lr_"),
                     donate_argnums=(0,))
        def train_window(state, corpus_img, corpus_tok, idx, ccfg_, lr_):
            def body(st, ix):
                st, aux = _ts(st, corpus_img[ix], corpus_tok[ix],
                              jnp.zeros(ix.shape[0], jnp.int32),
                              jnp.ones(ix.shape[0], bool), ccfg_, lr=lr_)
                return st, aux["loss"]
            return jax.lax.scan(body, state, idx)

        corpus_img = jnp.asarray(images)
        corpus_tok = jnp.asarray(tokens)
        step = 0
        while step < args.steps:
            k = min(args.scan_steps, args.steps - step)
            idx = np.stack([rng.choice(n, args.batch, replace=False)
                            for _ in range(k)])
            ts = time.time()
            state, losses = train_window(state, corpus_img, corpus_tok,
                                         jnp.asarray(idx), ccfg, args.lr)
            losses = np.asarray(losses)  # fences the window
            if step > 0:
                step_times += [(time.time() - ts) / k] * k
            first = first if first is not None else float(losses[0])
            last = float(losses[-1])
            print(f"  step {step}: loss={last:.3f}", flush=True)
            step += k
    else:
        for step in range(args.steps):
            sel = rng.choice(n, args.batch, replace=False)
            ts = time.time()
            state, aux = train_step(state, jnp.asarray(images[sel]),
                                    jnp.asarray(tokens[sel]),
                                    jnp.zeros(args.batch, jnp.int32),
                                    jnp.ones(args.batch, bool), ccfg,
                                    lr=args.lr)
            loss = float(aux["loss"])  # host readback fences the step
            if step > 0:
                step_times.append(time.time() - ts)
            first = first if first is not None else loss
            last = loss
            if step % 50 == 0:
                print(f"  step {step}: loss={loss:.3f}", flush=True)
    print(f"[selfcheck] trained {args.steps} steps in "
          f"{time.time() - t0:.0f}s", flush=True)
    step_ms = (1000.0 * sorted(step_times)[len(step_times) // 2]
               if step_times else 0.0)
    try:  # HBM headroom on real devices (absent on CPU)
        stats = jax.devices()[0].memory_stats() or {}
        hbm_peak_gb = round(stats.get("peak_bytes_in_use", 0) / 2**30, 2)
        hbm_limit_gb = round(stats.get("bytes_limit", 0) / 2**30, 2)
    except Exception:
        hbm_peak_gb = hbm_limit_gb = 0.0

    def evaluate(params):
        toks, _, _ = generate(params, jnp.asarray(np.stack(te_crops)),
                              jax.random.PRNGKey(1), ccfg)
        preds = [tok.decode(t) for t in np.asarray(toks)]
        class_hits = sum(1 for p, c in zip(preds, te_cls)
                         if CLASS_NAMES[c].split()[0] in p)
        enc = SentenceEncoder.create(0, cfg.sentence_encoder)
        ep = enc.encode(preds)
        er = enc.encode(te_caps)
        cos = float(np.mean(np.sum(ep * er, axis=1)))
        bleu = float(np.mean([caption_scores(p, r)["bleu"]
                              for p, r in zip(preds, te_caps)]))
        return preds, class_hits / len(preds), cos, bleu

    preds, acc, cos, bleu = evaluate(state.params)
    # serving-quality check: the bench serves int8 weights (W8A8); measure
    # the quality delta of the SAME trained model under quantization
    from embodied_captioning_tpu.models.quantize import quantize_params

    _, acc_q, cos_q, bleu_q = evaluate(quantize_params(state.params))

    spec = {}
    if args.speculative:
        # speculative decoding on the TRAINED model: exactness + fenced
        # timing at small batch (its latency-serving regime) — acceptance
        # on trained weights is the honest signal (random weights always
        # reject the layer-skip draft)
        from embodied_captioning_tpu.models.captioner import (
            generate_speculative,
        )

        qp = quantize_params(state.params)
        for bsz in (1, 4):
            imgs = jnp.asarray(np.stack(te_crops[:bsz]))
            tg, _, _ = generate(qp, imgs, jax.random.PRNGKey(1), ccfg)
            ts_, _ = generate_speculative(qp, imgs, ccfg)
            exact = bool(np.array_equal(np.asarray(tg), np.asarray(ts_)))

            def fenced_ms(fn, reps=5):
                _ = float(jnp.sum(fn()))  # warm
                best = []
                for _i in range(reps):
                    t0 = time.time()
                    _ = float(jnp.sum(fn()))
                    best.append(time.time() - t0)
                return 1000.0 * sorted(best)[len(best) // 2]

            g_ms = fenced_ms(
                lambda: generate(qp, imgs, jax.random.PRNGKey(1), ccfg)[0])
            s_ms = fenced_ms(lambda: generate_speculative(qp, imgs, ccfg)[0])
            spec[f"b{bsz}"] = {"exact": exact, "greedy_ms": round(g_ms, 1),
                               "speculative_ms": round(s_ms, 1),
                               "speedup": round(g_ms / max(s_ms, 1e-9), 2)}

    print(json.dumps({
        "train_crops": len(tr_crops), "test_crops": len(te_crops),
        "seed": args.seed, "eval_sha": eval_sha,
        "preset": args.preset, "batch": args.batch,
        "step_ms_median": round(step_ms, 1),
        "hbm_peak_gb": hbm_peak_gb, "hbm_limit_gb": hbm_limit_gb,
        "first_loss": round(first, 3), "last_loss": round(last, 3),
        "class_word_accuracy": round(acc, 3),
        "sbert_cosine": round(cos, 4), "bleu": round(bleu, 4),
        "int8_class_word_accuracy": round(acc_q, 3),
        "int8_sbert_cosine": round(cos_q, 4), "int8_bleu": round(bleu_q, 4),
        "examples": [{"pred": p, "ref": r}
                     for p, r in list(zip(preds, te_caps))[:4]],
        **({"speculative": spec} if spec else {}),
    }))


if __name__ == "__main__":
    main()
