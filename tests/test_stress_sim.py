"""Stress-eval sim axes (config.SimConfig distractors/walls/tex_boost)."""

import numpy as np

from embodied_captioning_tpu.config import load_config
from embodied_captioning_tpu.envs.sim import RaycastSim, generate_scene


def test_distractors_are_classless_and_occlude():
    cfg = load_config("tiny", overrides=[
        "sensors.height=64", "sensors.width=64", "sim.num_objects=4",
        "sim.scene_size=8.0", "sim.num_distractors=5",
        "sim.interior_walls=4", "sim.tex_boost=0.2",
    ])
    base = load_config("tiny", overrides=[
        "sensors.height=64", "sensors.width=64", "sim.num_objects=4",
        "sim.scene_size=8.0",
    ])
    s_stress = generate_scene(cfg.sim, seed=3)
    s_base = generate_scene(base.sim, seed=3)
    # stress scene has strictly more boxes, all extras classless
    n_stress = int(np.sum(np.asarray(s_stress.valid)))
    n_base = int(np.sum(np.asarray(s_base.valid)))
    assert n_stress > n_base
    cls = np.asarray(s_stress.class_id)[np.asarray(s_stress.valid)]
    cls_base = np.asarray(s_base.class_id)[np.asarray(s_base.valid)]
    # distractors + extra walls are all CLASSLESS: the classless surplus
    # accounts for the whole box surplus (no phantom target objects)
    assert ((cls < 0).sum() - (cls_base < 0).sum()
            >= (n_stress - n_base) - (cls >= 0).sum() + (cls_base >= 0).sum())
    assert (cls < 0).sum() >= (cls_base < 0).sum() + cfg.sim.num_distractors
    # tex_boost=0.2 lifts tex_amp above the unstressed U(0.05, 0.22) range
    assert float(s_stress.tex_amp) >= 0.25 > float(s_base.tex_amp)

    # GT detections still only cover the real classes (distractors have
    # instance_id -1 => never become GT instances)
    sim = RaycastSim(cfg.sim, cfg.sensors, seed=3)
    obs = sim.observe()
    det = sim.gt_detections(obs)
    assert np.asarray(det.classes)[np.asarray(det.valid)].min(initial=0) >= 0
    inst = np.asarray(obs["instances"])
    assert inst.max() < cfg.sim.num_objects  # distractor pixels are -1
