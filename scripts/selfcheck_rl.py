#!/usr/bin/env python
"""RL advantage proof (VERDICT r3 missing #3/next #4): PPO-train the
goal-exploration policy, then evaluate it against `randomgoalsbaseline` and
`frontierbaseline-v1` on FIXED eval scenes with the SAME trained perception
stack and step budget — disagreement reward and fog-of-war area coverage
per arm, across >= 2 training seeds. "The policy learns to seek
disagreement" gets a number (ref: experimenting_env/agents/goal_exploration/
goal_exploration.py:783-1010 train loop, envs/env_habitat3.py:75-84 reward,
env_semanticmap_disagreement.py:68-99 area_ratio).

Arms share: perception weights, eval scene seeds, episode length. They
differ only in the goal policy. Eval scenes are disjoint from the
perception-training scenes AND the PPO-training scenes.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def train_stack(cfg, det_steps, cap_steps, lr=3e-4):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from embodied_captioning_tpu.models import detector as DET
    from embodied_captioning_tpu.models.captioner import init_captioner
    from embodied_captioning_tpu.models.tokenizer import default_tokenizer
    from embodied_captioning_tpu.train.captioner_train import (
        create_train_state, train_step,
    )
    from selfcheck_detector import collect
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

    for _ in range(det_steps):
        idx = rng.choice(len(frames), 8, replace=False)
        imgs = jnp.asarray(np.stack([frames[i][0] for i in idx]))
        gt = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[frames[i][1] for i in idx])
        det_params, opt_state, _ = det_step(det_params, opt_state, imgs, gt)

    crops, caps, _ = collect_caps(cfg, 6, 12, 0, 256)
    ccfg = cfg.captioner
    tok = default_tokenizer(ccfg.text.vocab_size)
    state = create_train_state(init_captioner(jax.random.PRNGKey(1), ccfg),
                               lr=lr)
    tokens = tok.encode_batch(caps, ccfg.text.context_length)
    images = np.stack(crops)
    for _ in range(cap_steps):
        sel = rng.choice(len(images), 16, replace=False)
        state, _ = train_step(state, jnp.asarray(images[sel]),
                              jnp.asarray(tokens[sel]),
                              jnp.zeros(16, jnp.int32),
                              jnp.ones(16, bool), ccfg, lr=lr)
    return det_params, state.params


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="base", choices=["tiny", "base"])
    ap.add_argument("--seeds", default="0,1")
    ap.add_argument("--det-steps", type=int, default=400)
    ap.add_argument("--cap-steps", type=int, default=300)
    ap.add_argument("--ppo-updates", type=int, default=10)
    ap.add_argument("--decisions-per-update", type=int, default=8)
    ap.add_argument("--eval-steps", type=int, default=120)
    ap.add_argument("--eval-scenes", type=int, default=2,
                    help="eval envs (one fixed scene seed each)")
    ap.add_argument("--fused", action="store_true",
                    help="scan-fused training windows (one launch per "
                         "num_global_steps window) — reference-scale env "
                         "budgets under tunnel RPC latency (VERDICT r4 #8)")
    ap.add_argument("--entropy", default="",
                    help="comma list of entropy coefficients: train one "
                         "PPO arm per value per seed (collapse-breaking "
                         "sweep; '' = config default only)")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    import jax
    import numpy as np

    from embodied_captioning_tpu.agents import get_trainer
    from embodied_captioning_tpu.config import load_config
    from embodied_captioning_tpu.perception import Perceiver

    common = [
        "sim.num_objects=8", "sim.scene_size=8.0", "map.voxel_size=0.1",
        f"runtime.num_envs={args.eval_scenes}",
        "ppo.num_global_steps=10", "ppo.replanning_steps=10",
        "detector.score_threshold=0.2",
        f"sim.episode_steps={max(args.eval_steps, 300)}",
    ]
    cfg = load_config(args.preset, overrides=common + list(args.overrides))

    t0 = time.time()
    det_params, cap_params = train_stack(cfg, args.det_steps, args.cap_steps)
    print(f"[rl] perception stack trained ({time.time() - t0:.0f}s)",
          flush=True)

    def make_perceiver(c):
        p = Perceiver(c)
        p.params = p.params._replace(detector=det_params,
                                     captioner=cap_params)
        return p

    def evaluate(trainer_name, seed, ppo_state=None):
        """Run `eval_steps` of the arm's policy on the FIXED eval scenes;
        return final cumulative disagreement reward + area coverage."""
        ecfg = dataclasses.replace(
            cfg,
            sim=dataclasses.replace(cfg.sim, scene_seed=4000),
            runtime=dataclasses.replace(
                cfg.runtime, env_name="SemanticDisagreement-v0",
                seed=900 + seed, obs_dir=None))
        tr = get_trainer(trainer_name)(ecfg, perceiver=make_perceiver(ecfg))
        if ppo_state is not None:
            tr.ppo_state = ppo_state
        tr.generate(args.eval_steps)
        rewards = tr.rewards()  # cumulative disagreement sum / 1000
        areas = [env.area_ratio() for env in tr.envs.envs]
        objs = [int(env.map_state.num_objects) for env in tr.envs.envs]
        return {
            "disagreement_reward": round(float(np.sum(rewards)), 5),
            "area_ratio_mean": round(float(np.mean(areas)), 4),
            "mapped_objects": int(np.sum(objs)),
        }

    results = {"eval_steps": args.eval_steps, "preset": args.preset,
               "arms": {}}
    seeds = [int(s) for s in args.seeds.split(",")]

    # --- PPO arms: train per (seed, entropy), evaluate on eval scenes -----
    entropies = ([float(x) for x in args.entropy.split(",") if x]
                 or [cfg.ppo.entropy_coef])
    for ent in entropies:
        ppo_rows = []
        arm_name = ("ppo" if len(entropies) == 1 and ent == cfg.ppo.entropy_coef
                    else f"ppo_ent{ent:g}")
        for seed in seeds:
            t0 = time.time()
            tcfg = dataclasses.replace(
                cfg,
                sim=dataclasses.replace(cfg.sim,
                                        scene_seed=3000 + 100 * seed),
                ppo=dataclasses.replace(cfg.ppo, entropy_coef=ent),
                runtime=dataclasses.replace(cfg.runtime, seed=seed,
                                            obs_dir=None))
            tr = get_trainer("goalexplorationbaseline-v0")(
                tcfg, perceiver=make_perceiver(tcfg))
            # record per-window training rewards the rollouts actually saw
            reward_trace = []
            orig_rewards = tr._window_rewards

            def traced():
                r = orig_rewards()
                reward_trace.append(float(np.mean(r)))
                return r

            tr._window_rewards = traced
            tr.train(num_updates=args.ppo_updates,
                     decisions_per_update=args.decisions_per_update,
                     fused=args.fused)
            row = evaluate("goalexplorationbaseline-v0", seed,
                           ppo_state=tr.ppo_state)
            row["train_seconds"] = round(time.time() - t0, 1)
            row["env_steps"] = (args.ppo_updates * args.decisions_per_update
                                * cfg.ppo.num_global_steps
                                * cfg.runtime.num_envs)
            q = max(1, len(reward_trace) // 4)
            row["train_reward_first_quarter"] = round(
                float(np.mean(reward_trace[:q])), 5)
            row["train_reward_last_quarter"] = round(
                float(np.mean(reward_trace[-q:])), 5)
            ppo_rows.append(row)
            print(f"[rl] {arm_name} seed {seed}: {json.dumps(row)}",
                  flush=True)
        results["arms"][arm_name] = ppo_rows

    # --- classical baselines (same eval scenes, seeded control RNGs) ------
    for name, key in (("randomgoalsbaseline", "random_goals"),
                      ("frontierbaseline-v1", "frontier_v1")):
        rows = []
        for seed in seeds:
            rows.append(evaluate(name, seed))
            print(f"[rl] {key} seed {seed}: {json.dumps(rows[-1])}",
                  flush=True)
        results["arms"][key] = rows

    def agg(rows, k):
        vals = [r[k] for r in rows]
        return round(float(np.mean(vals)), 5), round(float(np.std(vals)), 5)

    summary = {}
    for arm, rows in results["arms"].items():
        m_r, s_r = agg(rows, "disagreement_reward")
        m_a, s_a = agg(rows, "area_ratio_mean")
        summary[arm] = {"reward_mean": m_r, "reward_std": s_r,
                        "area_mean": m_a, "area_std": s_a}
    results["summary"] = summary
    ppo_arms = [k for k in summary if k.startswith("ppo")]
    best = max(ppo_arms, key=lambda k: summary[k]["reward_mean"])
    ppo_r = summary[best]["reward_mean"]
    results["best_ppo_arm"] = best
    results["ppo_beats_random"] = bool(
        ppo_r > summary["random_goals"]["reward_mean"])
    results["ppo_beats_frontier"] = bool(
        ppo_r > summary["frontier_v1"]["reward_mean"])
    print(json.dumps(results))


if __name__ == "__main__":
    main()
