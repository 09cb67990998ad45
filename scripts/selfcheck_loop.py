#!/usr/bin/env python
"""Full-loop self-check (BASELINE config #5): train detector + captioner on
simulator GT, then run the goal-exploration loop with the trained perception
stack and show the disagreement reward machinery producing signal.

Pipeline: selfcheck-train detector & captioner -> Perceiver with trained
params -> goalexplorationbaseline-v0.generate() -> per-env disagreement
rewards, mapped objects, and caption examples."""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="tiny", choices=["tiny", "base"],
                    help="base = ViT-B captioner + 256^2 detector on-chip "
                         "(VERDICT round-2 next #10)")
    ap.add_argument("--det-steps", type=int, default=400)
    ap.add_argument("--cap-steps", type=int, default=300)
    ap.add_argument("--loop-steps", type=int, default=24)
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from embodied_captioning_tpu.config import load_config
    from embodied_captioning_tpu.models import detector as DET
    from embodied_captioning_tpu.models.captioner import init_captioner
    from embodied_captioning_tpu.models.tokenizer import default_tokenizer
    from embodied_captioning_tpu.train.captioner_train import (
        create_train_state, train_step,
    )

    base_over = {
        "tiny": ["sensors.height=64", "sensors.width=64"],
        # base keeps its native 256^2 sensors/detector + ViT-B captioner
        "base": [],
    }[args.preset]
    cfg = load_config(args.preset, overrides=base_over + [
        "sim.num_objects=8", "sim.scene_size=8.0", "map.voxel_size=0.1",
        "runtime.num_envs=2", "ppo.replanning_steps=8",
        "detector.score_threshold=0.2",
    ] + list(args.overrides))

    # ---- 1. train the detector on sim GT (selfcheck_detector recipe) ----
    from selfcheck_detector import collect  # same scripts dir
    from selfcheck_training import collect as collect_caps

    rng = np.random.default_rng(0)
    frames = collect(cfg, 6, 16, 0, rng)
    dcfg = cfg.detector
    det_params = DET.init_detector(jax.random.PRNGKey(0), dcfg)
    opt = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(2e-3))
    opt_state = opt.init(det_params)

    @jax.jit
    def det_step(params, opt_state, images, gt):
        (loss, _), grads = jax.value_and_grad(
            lambda p: DET.detector_loss(p, images, gt, dcfg, head="ce"),
            has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.time()
    for s in range(args.det_steps):
        idx = rng.choice(len(frames), 8, replace=False)
        imgs = jnp.asarray(np.stack([frames[i][0] for i in idx]))
        gt = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[frames[i][1] for i in idx])
        det_params, opt_state, dloss = det_step(det_params, opt_state, imgs,
                                                gt)
    print(f"[loop] detector trained {args.det_steps} steps "
          f"({time.time() - t0:.0f}s, loss={float(dloss):.3f})", flush=True)

    # ---- 2. train the captioner on template captions ---------------------
    crops, caps, _ = collect_caps(cfg, 6, 12, 0, 256)
    ccfg = cfg.captioner
    tok = default_tokenizer(ccfg.text.vocab_size)
    cap_params = init_captioner(jax.random.PRNGKey(1), ccfg)
    state = create_train_state(cap_params, lr=3e-4)
    tokens = tok.encode_batch(caps, ccfg.text.context_length)
    images = np.stack(crops)
    t0 = time.time()
    for s in range(args.cap_steps):
        sel = rng.choice(len(images), 16, replace=False)
        state, aux = train_step(state, jnp.asarray(images[sel]),
                                jnp.asarray(tokens[sel]),
                                jnp.zeros(16, jnp.int32),
                                jnp.ones(16, bool), ccfg, lr=3e-4)
    print(f"[loop] captioner trained {args.cap_steps} steps "
          f"({time.time() - t0:.0f}s, loss={float(aux['loss']):.3f})",
          flush=True)

    # ---- 3. run the goal-exploration loop with trained perception --------
    from embodied_captioning_tpu.agents import get_trainer
    from embodied_captioning_tpu.perception import Perceiver

    perceiver = Perceiver(cfg)
    perceiver.params = perceiver.params._replace(detector=det_params,
                                                 captioner=state.params)
    trainer = get_trainer("goalexplorationbaseline-v0")(
        cfg, perceiver=perceiver)
    t0 = time.time()
    obs = trainer.envs.observe()
    n_caps = 0
    example = None
    reward_trace = []
    for step in range(args.loop_steps):
        result = trainer.perceive_and_fuse(obs)
        reward_trace.append(float(np.sum(trainer.rewards())))
        if result is not None:
            valid = np.asarray(result.detections.valid)
            if valid.any() and example is None:
                caps_txt = trainer.perceiver.captions(result)
                e, i = np.argwhere(valid)[0]
                example = caps_txt[e][i]
            n_caps += int(valid.sum())
        if step % cfg.ppo.replanning_steps == 0:
            maps, orients = trainer._policy_obs()
            a, _, _, _ = __import__(
                "embodied_captioning_tpu.agents.policy",
                fromlist=["act"]).act(
                trainer.ppo_state.params, jax.random.PRNGKey(step),
                jnp.asarray(maps), jnp.asarray(orients))
            trainer._goals_from_actions(np.asarray(a))
        acts = trainer.actions(obs)
        obs, _, _, _ = trainer.envs.step(acts)
    rewards = trainer.rewards()
    objects = [int(env.map_state.num_objects) for env in trainer.envs.envs]
    dt = time.time() - t0
    half = len(reward_trace) // 2
    print(json.dumps({
        "preset": args.preset,
        "loop_steps": args.loop_steps,
        "seconds": round(dt, 1),
        "loop_fps": round(cfg.runtime.num_envs * args.loop_steps / dt, 2),
        "reward_mean_first_half": round(
            float(np.mean(reward_trace[:half])) if half else 0.0, 5),
        "reward_mean_second_half": round(
            float(np.mean(reward_trace[half:])), 5),
        "captioned_detections": n_caps,
        "mapped_objects_per_env": objects,
        "disagreement_rewards": [round(float(r), 5) for r in rewards],
        "example_caption": example,
    }))


if __name__ == "__main__":
    main()
