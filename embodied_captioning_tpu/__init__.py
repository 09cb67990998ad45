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


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache: every CLI entry benefits (compiles
    on this host are expensive; the cache is keyed by HLO so tiny/base
    presets reuse across processes). Opt out with ECAP_NO_COMPILE_CACHE=1."""
    import os

    if os.environ.get("ECAP_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        cache_dir = os.environ.get("ECAP_COMPILE_CACHE",
                                   "/tmp/ecap_jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


def _apply_platform_override() -> None:
    """Honor ECAP_PLATFORM (e.g. "cpu") — the axon sitecustomize overrides
    the JAX_PLATFORMS env var via jax.config, so the framework re-applies an
    explicit choice here. Host-only eval CLIs set this to "cpu"."""
    import os

    plat = os.environ.get("ECAP_PLATFORM")
    if not plat:
        return
    try:
        import jax

        jax.config.update("jax_platforms", plat)
    except Exception:  # pragma: no cover
        pass


_enable_compile_cache()
_apply_platform_override()
