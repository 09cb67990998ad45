"""embodied_captioning_tpu — a TPU-native (JAX/XLA/Pallas/pjit) embodied
image-captioning framework.

From-scratch rebuild of the capabilities of hsp-iit/embodied-captioning
(arXiv 2504.08531): an embodied agent explores indoor scenes, detects object
instances per frame, captions each detection with a ViT encoder + KV-cached
autoregressive decoder, embeds captions with a MiniLM-class sentence encoder,
fuses everything into a per-episode 3D semantic voxel map whose per-object
caption-embedding disagreement drives an RL exploration policy, then distills
multi-view captions into pseudo-captions and fine-tunes captioner + detector.

Subpackages
-----------
ops       device kernels (preprocess, NMS, ROI-align, attention, voxel scatter)
models    ViT captioner, sentence encoder, instance detector, RL policy
mapping   3D semantic voxel map + consensus (the disagreement core)
envs      simulator protocol, built-in raycast simulator, env + vector env
agents    exploration baselines, planners, PPO trainer
labeling  pseudo-label / pseudo-caption consensus
train     fine-tuning pipelines (teacher-student, captioner)
parallel  mesh / sharding helpers
utils     obs store, metrics, profiling, checkpointing
"""

__version__ = "0.1.0"
