"""The fused per-frame perception program: detect → crop → caption → embed.

This is the hot path of the whole system. The reference runs it as four
separate host-orchestrated stages — Mask2Former batch forward, a python loop
of PIL crops, a per-crop uncached CoCa decode, then SBERT on CPU
(ref: experimenting_env/agents/goal_exploration/goal_exploration.py:77-144
predict_current_bbs_and_update_pcd). Here the entire chain is ONE jit'd XLA
program over the env batch:

  images [E, S, S, 3] u8
    -> detector forward (FPN/RPN/ROI, bf16)             models/detector.py
    -> full-frame masks (paste)                          ops/image.py
    -> box expand 0.2 + crop-resize all E*N crops        ops/detections.py
    -> KV-cached batched caption decode                  models/captioner.py
    -> sentence embedding of the generated token ids     models/sbert.py
       (captioner and sentence encoder share the framework tokenizer, so
        embeddings never require a host text round-trip)

Captions only surface to the host as token ids when the caller wants strings
(observation store / logging).
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import ExperimentConfig
from .models import captioner as CAP
from .models import detector as DET
from .models import sbert as SB
from .models.tokenizer import Tokenizer, default_tokenizer
from .ops.detections import Detections, expand_boxes
from .ops.image import crop_and_resize, resize_bilinear

CROP_EXPAND = 0.2  # ref: detector/pseudolabeler.py:653-672


class PerceptionParams(NamedTuple):
    detector: dict
    captioner: dict
    sbert: dict


class FrameResult(NamedTuple):
    detections: Detections      # [E, N, ...] with full-frame masks+embeddings
    caption_tokens: jnp.ndarray  # [E, N, L]
    caption_logprobs: jnp.ndarray  # [E, N, L-1] chosen-token log-probs
    caption_lengths: jnp.ndarray  # [E, N]


def init_perception(key, cfg: ExperimentConfig) -> PerceptionParams:
    k1, k2, k3 = jax.random.split(key, 3)
    return PerceptionParams(
        detector=DET.init_detector(k1, cfg.detector),
        captioner=CAP.init_captioner(k2, cfg.captioner),
        sbert=SB.init_sentence_encoder(k3, cfg.sentence_encoder),
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def perceive(params: PerceptionParams, images_u8: jnp.ndarray, rng,
             cfg: ExperimentConfig) -> FrameResult:
    """images [E, S, S, 3] uint8 -> FrameResult. One XLA program.

    Caption-slot compaction: the reference captions only its real,
    above-threshold detections (typically 1-4 per frame at Mask2Former
    threshold 0.9; its bbsf sensor caps at 10, ref: envs/sensors.py:54-98),
    while our Detections struct pads to max_detections. When
    `runtime.caption_slots_per_frame` > 0, the `slots` highest-scored
    detection slots OF EACH FRAME are cropped/captioned/embedded (static
    shapes: a per-row top-k gather — matching the reference's per-frame
    "caption every above-threshold detection" semantics,
    ref: goal_exploration.py:77-144), cutting ViT+decode FLOPs by N/slots
    without changing the detection output; uncaptioned slots get zero
    embeddings. 0 captions every slot (the padded worst case)."""
    e = images_u8.shape[0]
    size = cfg.detector.image_size
    src = images_u8.shape[1]
    if src != size:
        # on-device sensor->detector preprocess (separable-matmul bilinear):
        # the reference runs the HF processor's 1280^2 resize on host CPU
        # (ref: predictor_utils.py:308-379); here the full-res frame stays
        # on device and only the detector sees the downscale — caption
        # crops below are taken from the ORIGINAL sensor frame. The resize
        # output feeds the detector as float directly (bilinear hat weights
        # are a convex combination, so values stay in [0, 255]; a uint8
        # round-trip would re-materialize the 1024^2 batch for no reason)
        det_in = resize_bilinear(images_u8.astype(jnp.float32), size, size)
    else:
        det_in = images_u8
    det = DET.forward(params.detector, det_in, cfg.detector)
    # full-frame masks at paste_size (boxes live in detector pixel space)
    paste = cfg.detector.paste_size or size
    fmasks = DET.full_masks(det, paste, size)  # [E, N, paste, paste]
    det = det.replace(masks=fmasks)

    n = det.capacity
    spf = cfg.runtime.caption_slots_per_frame
    c = e * spf if 0 < spf < n else e * n  # captioned crop count (static)

    boxes = expand_boxes(det.boxes, CROP_EXPAND, size, size)
    boxes = boxes * (src / size)  # crop coords in sensor pixel space
    crop_size = cfg.captioner.vision.image_size

    if c < e * n:
        # per-frame top-k (NOT batch-global): a crowded frame must not
        # starve other frames' detections of captions
        _, sel_n = jax.lax.top_k(det.scores * det.valid, spf)  # [E, spf]
        sel = (jnp.arange(e)[:, None] * n + sel_n).reshape(c)  # flat indices
        # gather BOXES per frame, never frames per box: images_u8[img_idx]
        # would materialize spf duplicate copies of every sensor frame
        # (~157 MB/launch at the large preset) on the hot path
        boxes_sel = jnp.take_along_axis(boxes, sel_n[..., None], axis=1)

        def crops_sel_one(img, bxs):
            return crop_and_resize(img.astype(jnp.float32), bxs, crop_size)

        crops = jax.vmap(crops_sel_one)(images_u8, boxes_sel)  # [E,spf,s,s,3]
        flat = crops.reshape(c, crop_size, crop_size, 3).astype(jnp.uint8)
        row_valid = jnp.take_along_axis(det.valid, sel_n, axis=1).reshape(c)
    else:
        sel = jnp.arange(e * n)
        row_valid = det.valid.reshape(e * n)

        def crops_one(img, bxs):
            return crop_and_resize(img.astype(jnp.float32), bxs, crop_size)

        crops = jax.vmap(crops_one)(images_u8, boxes)  # [E, N, s, s, 3]
        flat = crops.reshape(e * n, crop_size, crop_size, 3
                             ).astype(jnp.uint8)

    # invalid (padded) slots start finished: they emit only PAD and cost
    # zero decode steps through generate's while_loop early exit — the
    # reference captions only its real detections, and slot embeddings are
    # zeroed by det.valid downstream anyway. caption_invalid_slots=True
    # (bench.py) decodes every selected slot regardless, keeping throughput
    # numbers independent of the detector's hit rate.
    if cfg.runtime.caption_invalid_slots:
        row_valid = None
    tokens, logprobs, lengths = CAP.generate(
        params.captioner, flat, rng, cfg.captioner,
        max_len=cfg.captioner.max_caption_len, row_valid=row_valid)

    # sentence-embed the generated ids directly (shared vocab)
    se_len = cfg.sentence_encoder.max_len
    l = tokens.shape[1]
    # sbert's pad-mask convention is token id 0 (models/sbert.PAD_ID);
    # normalize the captioner's pad id to 0 so a ported checkpoint with
    # pad_id != 0 (CLIP BPE pads with 0 too, but the dataclass permits
    # anything) can't leak pad tokens into the sentence embedding
    se_src = jnp.where(tokens == cfg.captioner.text.pad_id, 0, tokens)
    if l >= se_len:
        se_tokens = se_src[:, :se_len]
    else:
        se_tokens = jnp.pad(se_src, ((0, 0), (0, se_len - l)))
    emb = SB.encode_tokens(params.sbert, se_tokens, cfg.sentence_encoder)

    # scatter compacted results back to [E, N] slots
    if c < e * n:
        d_emb = emb.shape[-1]
        full_emb = jnp.zeros((e * n, d_emb), emb.dtype).at[sel].set(emb)
        full_tok = jnp.zeros((e * n, l), tokens.dtype).at[sel].set(tokens)
        full_lp = jnp.zeros((e * n, logprobs.shape[1]), logprobs.dtype
                            ).at[sel].set(logprobs)
        full_len = jnp.zeros((e * n,), lengths.dtype).at[sel].set(lengths)
    else:
        full_emb, full_tok, full_lp, full_len = emb, tokens, logprobs, lengths

    emb = full_emb.reshape(e, n, -1) * det.valid[..., None]
    det = det.replace(embeddings=emb)
    return FrameResult(
        detections=det,
        caption_tokens=full_tok.reshape(e, n, -1),
        caption_logprobs=full_lp.reshape(e, n, -1),
        caption_lengths=full_len.reshape(e, n),
    )


def perceive_sharded(params: PerceptionParams, images_u8: jnp.ndarray, rng,
                     cfg: ExperimentConfig, mesh) -> FrameResult:
    """Multi-chip serving: the env/frame batch is sharded over the mesh's
    "data" axis (params replicated), so throughput scales ~linearly with
    chips — the fused perception program itself is unchanged; XLA propagates
    the batch sharding through detector, captioner decode loop and sentence
    encoder. Batch must be divisible by mesh.shape["data"].
    (ref: the reference scales by habitat worker processes per GPU,
    utils/habitat_utils.py:54-150; here scaling is a sharding annotation.)"""
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert images_u8.shape[0] % mesh.shape["data"] == 0, (
        f"batch {images_u8.shape[0]} not divisible by data axis "
        f"{mesh.shape['data']}")
    rep = NamedSharding(mesh, P())
    params = jax.device_put(params, rep)
    images = jax.device_put(jnp.asarray(images_u8),
                            NamedSharding(mesh, P("data")))
    rng = jax.device_put(rng, rep)
    return perceive(params, images, rng, cfg)


class Perceiver:
    """Host-facing wrapper: owns params, tokenizer, and rng; decodes caption
    strings on demand."""

    def __init__(self, cfg: ExperimentConfig, seed: int = 0,
                 params: Optional[PerceptionParams] = None):
        self.cfg = cfg
        self.params = params or init_perception(jax.random.PRNGKey(seed), cfg)
        self.tokenizer: Tokenizer = default_tokenizer(
            cfg.captioner.text.vocab_size)
        self._rng = jax.random.PRNGKey(seed + 1)

    def process(self, images_u8: np.ndarray) -> FrameResult:
        """Square [.., H, H, 3] uint8 frames at ANY resolution: `perceive`
        resizes to the detector input on device and crops captions from the
        original frame. Non-square input is squared here first."""
        self._rng, sub = jax.random.split(self._rng)
        images = jnp.asarray(images_u8)
        if images.ndim == 3:
            images = images[None]
        if images.shape[1] != images.shape[2]:
            side = max(images.shape[1], images.shape[2])
            images = jnp.clip(
                resize_bilinear(images.astype(jnp.float32), side, side),
                              0, 255).astype(jnp.uint8)
        return perceive(self.params, images, sub, self.cfg)

    def captions(self, result: FrameResult) -> list:
        """[[str per detection] per env] (only valid slots meaningful)."""
        toks = np.asarray(result.caption_tokens)
        out = []
        for erow in toks:
            out.append([self.tokenizer.decode(t) for t in erow])
        return out
