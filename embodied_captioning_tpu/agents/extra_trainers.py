"""Remaining trainer family: frontier v2/v3, curiosity, captioned random
goals, informative-trajectories, observe-object-discrete.

Parity targets (ref: experimenting_env/agents/):
  frontierbaseline-v2/-v3  frontier exploration + per-step detector/captioner/
                           SBERT embeddings; v3 re-sends the subgoal upon
                           arrival (frontier_exploration.py:27-120,409-470)
  curiosity-v0             semantic-curiosity discrete policy over topdown
                           semantic maps (semantic_curiosity.py:26-60)
  randomgoalsbaselinecaptioner  random goals + captioner with GT detector
                           (temp_baseline.py:80)
  informative-trajectories-v0   goal exploration with rich training logs
                           (informative_trajectories.py:25,502-740)
  observeobjectdiscreteactionsbaseline  scripted orbiter, discrete control
                           (baselines.py:1202-1578)
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ExperimentConfig
from ..utils.logging import MetricsLogger
from .baselines import (
    BaseTrainer, ObserveObjectBaseline, RandomGoalsBaseline,
    _GoalDirectedTrainer, FrontierBaseline,
)
from .goal_exploration import GoalExplorationTrainer
from .registry import register_trainer


@register_trainer("frontierbaseline-v2")
class FrontierPerceptionBaseline(FrontierBaseline):
    """Frontier exploration informed by the perception stream (ref:
    frontier_exploration.py:27-120 — v2 runs detector+captioner+SBERT per
    step and fuses embeddings into the map). The behavioral delta over v1:
    frontier info gain integrates the caption-disagreement channel in
    addition to unexplored area, steering the agent toward frontiers near
    objects whose descriptions still disagree."""

    DISAGREEMENT_WEIGHT = 5.0

    def _gain_field(self, maps: np.ndarray) -> np.ndarray:
        unexp = (~(maps[..., 1] > 0.5)).astype(np.float64)
        return unexp + self.DISAGREEMENT_WEIGHT * maps[..., 3]


@register_trainer("frontierbaseline-v3")
class FrontierResendBaseline(FrontierBaseline):
    """v3: on subgoal arrival, re-send the goal once before replanning
    (ref: frontier_exploration.py:409-470) — keeps the agent dwelling at
    informative frontiers for extra views."""

    def __init__(self, cfg, **kw):
        super().__init__(cfg, **kw)
        self._resend: List[Optional[Tuple[float, float]]] = [
            None] * self.envs.num_envs

    def new_goal(self, i):
        if self._resend[i] is not None:
            g = self._resend[i]
            self._resend[i] = None
            return g
        g = super().new_goal(i)
        self._resend[i] = g
        return g


@register_trainer("curiosity-v0")
class SemanticCuriosityBaseline(_GoalDirectedTrainer):
    """Semantic-curiosity exploration (ref: semantic_curiosity.py:26-60):
    goals are map cells where semantic classes were observed (the policy
    seeks more object views), weighted by per-cell disagreement."""

    def new_goal(self, i):
        env = self.envs.envs[i]
        maps = env.get_and_update_disagreement_map()
        sem = maps[..., 2]
        dis = maps[..., 3]
        score = (sem > 0) * (0.1 + dis)
        ys, xs = np.nonzero(score > 0.05)
        if len(ys) == 0:
            return RandomGoalsBaseline.new_goal(self, i)
        j = int(np.argmax(score[ys, xs]))
        vox = self.cfg.map.voxel_size
        lower = np.asarray(env.map_state.lower)
        return (float(xs[j] + 0.5) * vox + lower[0],
                float(ys[j] + 0.5) * vox + lower[2])


@register_trainer("randomgoalsbaselinecaptioner")
class RandomGoalsCaptionerBaseline(RandomGoalsBaseline):
    """Random goals + captioning of GT detections instead of learned
    detections (ref: temp_baseline.py:80): detector boxes come from the
    simulator's GT sensor; crops still go through the captioner+SBERT."""

    def perceive_and_fuse(self, obs):
        from ..models.captioner import generate
        from ..models.sbert import encode_tokens
        from ..ops.detections import expand_boxes
        from ..ops.image import crop_and_resize
        from ..perception import FrameResult

        if self.perceiver is None:
            return None
        cfg = self.cfg
        dets, tok_rows, lp_rows, len_rows = [], [], [], []
        for i, env in enumerate(self.envs.envs):
            single = {k: v[i] for k, v in obs.items()}
            det = env.sim.gt_detections(single,
                                        max_instances=cfg.detector.max_detections)
            h, w = single["rgb"].shape[:2]
            boxes = expand_boxes(det.boxes, 0.2, h, w)
            crops = crop_and_resize(
                jnp.asarray(single["rgb"], jnp.float32), boxes,
                cfg.captioner.vision.image_size).astype(jnp.uint8)
            toks, lps, lens = generate(self.perceiver.params.captioner, crops,
                                       jax.random.PRNGKey(self._step),
                                       cfg.captioner)
            se_len = cfg.sentence_encoder.max_len
            pad = jnp.zeros((toks.shape[0], max(0, se_len - toks.shape[1])),
                            toks.dtype)
            emb = encode_tokens(self.perceiver.params.sbert,
                                jnp.concatenate([toks, pad], 1)[:, :se_len],
                                cfg.sentence_encoder)
            det = det.replace(embeddings=emb * det.valid[:, None])
            pose = jnp.asarray(env.sim.agent.camera_matrix(), jnp.float32)
            d_i = jnp.asarray(single["depth"])
            env.update_pointcloud(det, depth=d_i, pose=pose)
            if hasattr(env, "set_last_frame"):  # KL-reward env variant
                env.set_last_frame(det, d_i, pose)
            dets.append(det)
            tok_rows.append(toks)
            lp_rows.append(lps)
            len_rows.append(lens)
        # a real FrameResult, so save_step_obs records the GT detections +
        # captions (returning None silently dropped every bbs payload —
        # the captioned-observation output is this baseline's purpose,
        # ref: temp_baseline.py:80)
        batched = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *dets)
        return FrameResult(
            detections=batched,
            caption_tokens=jnp.stack(tok_rows),
            caption_logprobs=jnp.stack(lp_rows),
            caption_lengths=jnp.stack(len_rows))


@register_trainer("informative-trajectories-v0")
class InformativeTrajectoriesTrainer(GoalExplorationTrainer):
    """Goal exploration + rich per-update training logs
    (ref: informative_trajectories.py:502-740 _training_log writes scalars/
    images to tensorboard; here a MetricsLogger JSONL stream)."""

    def __init__(self, cfg: ExperimentConfig, **kw):
        super().__init__(cfg, **kw)
        out = cfg.runtime.checkpoint_dir or cfg.runtime.obs_dir
        self.logger = MetricsLogger(out, run_name="informative_trajectories")

    def _after_update(self, update: int) -> bool:
        # log INSIDE the training loop so each row carries that update's
        # actual env rewards (logging after train() finished would stamp
        # the terminal reward onto every historical row)
        stop = super()._after_update(update)
        rewards = self.rewards()
        self.logger.log({**self.metrics_log[-1],
                         "mean_env_reward": float(rewards.mean()),
                         "max_env_reward": float(rewards.max())},
                        step=update)
        return stop


@register_trainer("observeobjectdiscreteactionsbaseline")
class ObserveObjectDiscrete(ObserveObjectBaseline):
    """Discrete-action orbiter: same viewpoints, but turns toward the object
    at each orbit stop before moving on (ref: baselines.py:1202-1578)."""

    DWELL_STEPS = 3

    def __init__(self, cfg, **kw):
        super().__init__(cfg, **kw)
        self._dwell = np.zeros(self.envs.num_envs, np.int32)

    def actions(self, obs):
        from .baselines import ACTION_LEFT, ACTION_STOP

        # dwell BEFORE letting the base replan: super().actions() consumes
        # the next orbit viewpoint the moment _waypoints empties, which
        # capped the dwell at a single scan step per viewpoint
        acts = []
        for i in range(self.envs.num_envs):
            if not self._waypoints[i] and 0 < self._dwell[i] < self.DWELL_STEPS:
                self._dwell[i] += 1
                acts.append(ACTION_LEFT)
                continue
            if not self._waypoints[i]:
                self._plan_to(i, self.new_goal(i))
                self._dwell[i] = 0
            a = self._follow(i)
            if a == ACTION_STOP:  # arrived: start the dwell
                self._waypoints[i] = []
                self._dwell[i] = 1
                a = ACTION_LEFT
            acts.append(a)
        return acts

    def on_episode_reset(self, i: int) -> None:
        super().on_episode_reset(i)
        self._dwell[i] = 0
