"""Florence-2-class unified vision-language model: detection as language.

Third captioner family (the reference's evaluate_finetuned_model.py offers
coca/blip2/florence2 backends, ref: scripts/evaluate_finetuned_model.py:26-160).
Florence-2's core idea: one seq2seq model emits *task-conditioned* token
sequences — captions for "<CAPTION>", and `<loc_i> x4 + class-word` groups
for "<OD>" object detection — with box coordinates quantized into location
tokens appended to the text vocabulary.

Compact from-scratch implementation on the framework blocks: ViT encoder
(models/vit.py) + causal decoder with cross-attention, task tokens, and
`NUM_LOC_BINS` location tokens. KV-cached greedy generation, teacher-forced
loss, and box<->token codecs with exact round-trip at bin resolution.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CLASS_NAMES, NUM_CLASSES, VitConfig
from .common import (
    KVCache, Params, block, block_init, dense, dense_init, embedding_init,
    layernorm, layernorm_init, precompute_kv,
)
from .tokenizer import BOS_ID, EOS_ID, PAD_ID, Tokenizer, default_tokenizer
from .vit import init_vit, vit_features
from ..ops.image import preprocess_for_vit

NUM_LOC_BINS = 64


@dataclass(frozen=True)
class FlorenceConfig:
    vision: VitConfig = field(default_factory=VitConfig)
    text_vocab: int = 1024           # base BPE vocab
    width: int = 768
    layers: int = 12
    heads: int = 12
    max_seq: int = 128
    mlp_ratio: float = 4.0

    # derived vocab layout: [text | loc bins | task tokens | class tokens]
    @property
    def loc_offset(self) -> int:
        return self.text_vocab

    @property
    def task_offset(self) -> int:
        return self.text_vocab + NUM_LOC_BINS

    @property
    def class_offset(self) -> int:
        return self.task_offset + len(TASKS)

    @property
    def vocab_size(self) -> int:
        return self.class_offset + NUM_CLASSES

    @staticmethod
    def tiny() -> "FlorenceConfig":
        return FlorenceConfig(
            vision=VitConfig(image_size=64, patch_size=8, width=64, layers=2,
                             heads=2, pool_queries=8, pool_heads=2,
                             embed_dim=64),
            width=64, layers=2, heads=2, max_seq=48)


TASKS = ("<CAPTION>", "<OD>")
TASK_CAPTION = 0
TASK_OD = 1


# ---------------------------------------------------------------------------
# box <-> location-token codec
# ---------------------------------------------------------------------------


def boxes_to_loc_tokens(boxes: np.ndarray, image_size: int,
                        cfg: FlorenceConfig) -> np.ndarray:
    """XYXY pixel boxes [N, 4] -> loc token ids [N, 4] (bin = floor(x/S * B),
    clamped)."""
    b = np.clip((np.asarray(boxes) / image_size * NUM_LOC_BINS), 0,
                NUM_LOC_BINS - 1).astype(np.int64)
    return b + cfg.loc_offset


def loc_tokens_to_boxes(tokens: np.ndarray, image_size: int,
                        cfg: FlorenceConfig) -> np.ndarray:
    """loc token ids [N, 4] -> XYXY boxes at bin-center resolution."""
    bins = np.asarray(tokens) - cfg.loc_offset
    return (bins + 0.5) / NUM_LOC_BINS * image_size


def encode_od_targets(boxes: np.ndarray, classes: np.ndarray,
                      valid: np.ndarray, image_size: int,
                      cfg: FlorenceConfig) -> List[int]:
    """Linearize detections into the OD token sequence:
    BOS <OD> (loc loc loc loc cls)* EOS."""
    seq = [BOS_ID, cfg.task_offset + TASK_OD]
    for i in np.nonzero(np.asarray(valid))[0]:
        seq += list(boxes_to_loc_tokens(boxes[i][None], image_size,
                                        cfg)[0])
        seq.append(cfg.class_offset + int(classes[i]))
    seq.append(EOS_ID)
    return seq


def decode_od_sequence(tokens: np.ndarray, image_size: int,
                       cfg: FlorenceConfig
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Parse a generated OD sequence -> (boxes [K, 4], classes [K])."""
    toks = [int(t) for t in np.asarray(tokens)
            if t not in (BOS_ID, PAD_ID)]
    if toks and toks[0] == cfg.task_offset + TASK_OD:
        toks = toks[1:]
    boxes, classes = [], []
    group: List[int] = []
    for t in toks:
        if t == EOS_ID:
            break
        if cfg.loc_offset <= t < cfg.loc_offset + NUM_LOC_BINS:
            group.append(t)
        elif t >= cfg.class_offset and len(group) >= 4:
            boxes.append(loc_tokens_to_boxes(
                np.asarray(group[:4])[None], image_size, cfg)[0])
            classes.append(t - cfg.class_offset)
            group = []
        else:
            group = []
    if not boxes:
        return np.zeros((0, 4), np.float32), np.zeros((0,), np.int64)
    return np.stack(boxes).astype(np.float32), np.asarray(classes)


def encode_caption_targets(caption_ids: List[int], cfg: FlorenceConfig
                           ) -> List[int]:
    """BOS <CAPTION> text... EOS (caption_ids from the shared tokenizer,
    without BOS/EOS)."""
    return [BOS_ID, cfg.task_offset + TASK_CAPTION] + list(caption_ids) + \
        [EOS_ID]


# ---------------------------------------------------------------------------
# model
# ---------------------------------------------------------------------------


def init_florence(key, cfg: FlorenceConfig) -> Params:
    ks = iter(jax.random.split(key, 6 + cfg.layers))
    return {
        "vision": init_vit(next(ks), cfg.vision),
        "tok_emb": embedding_init(next(ks), cfg.vocab_size, cfg.width),
        "pos_emb": jax.random.normal(next(ks), (cfg.max_seq, cfg.width))
        * 0.02,
        "blocks": [block_init(next(ks), cfg.width, cfg.heads, cfg.mlp_ratio,
                              cross_dim=cfg.vision.width)
                   for _ in range(cfg.layers)],
        "ln": layernorm_init(cfg.width),
        "head": dense_init(next(ks), cfg.width, cfg.vocab_size),
    }


def _encode(params: Params, images_u8: jnp.ndarray, cfg: FlorenceConfig):
    return vit_features(params["vision"], preprocess_for_vit(
        images_u8, cfg.vision.image_size, cfg.vision.patch_size), cfg.vision)


@functools.partial(jax.jit, static_argnames=("cfg",))
def florence_logits(params: Params, images_u8: jnp.ndarray,
                    tokens: jnp.ndarray, cfg: FlorenceConfig) -> jnp.ndarray:
    """Teacher-forced decoder logits [B, T, V]."""
    from .common import causal_mask

    feats = _encode(params, images_u8, cfg)
    t = tokens.shape[1]
    x = (params["tok_emb"][tokens]
         + params["pos_emb"][None, :t]).astype(jnp.bfloat16)  # bf16 stream
    mask = causal_mask(t)
    for blk in params["blocks"]:
        x, _ = block(blk, x, cfg.heads, mask=mask, cross=feats)
    return dense(params["head"], layernorm(params["ln"], x))


def florence_loss(params: Params, images_u8: jnp.ndarray,
                  tokens: jnp.ndarray, cfg: FlorenceConfig):
    """Next-token CE over the linearized task sequence (caption or OD)."""
    logits = florence_logits(params, images_u8, tokens, cfg)
    tgt = tokens[:, 1:]
    mask = (tgt != PAD_ID).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


@functools.partial(jax.jit, static_argnames=("cfg", "task", "max_len"))
def generate(params: Params, images_u8: jnp.ndarray, cfg: FlorenceConfig,
             task: int = TASK_CAPTION, max_len: Optional[int] = None):
    """KV-cached greedy generation conditioned on the task token.
    Returns (tokens [B, L] incl. BOS+task, lengths [B])."""
    max_len = max_len or cfg.max_seq
    b = images_u8.shape[0]
    feats = _encode(params, images_u8, cfg)
    head_dim = cfg.width // cfg.heads
    caches = tuple(KVCache.create(b, max_len, cfg.heads, head_dim)
                   for _ in range(cfg.layers))
    cross_kvs = tuple(precompute_kv(blk["xattn"], feats, cfg.heads)
                      for blk in params["blocks"])

    def run_token(tok, pos, caches):
        x = (params["tok_emb"][tok][:, None]
             + params["pos_emb"][pos][None, None]).astype(jnp.bfloat16)
        cs = []
        for blk, c, ckv in zip(params["blocks"], caches, cross_kvs):
            x, c = block(blk, x, cfg.heads, cache=c, cross_kv=ckv)
            cs.append(c)
        logits = dense(params["head"], layernorm(params["ln"], x))[:, 0]
        return logits, tuple(cs)

    # prime with BOS then the task token
    tok0 = jnp.full((b,), BOS_ID, jnp.int32)
    _, caches = run_token(tok0, 0, caches)
    task_tok = jnp.full((b,), cfg.task_offset + task, jnp.int32)

    def step(carry, pos):
        tok, finished, caches = carry
        logits, caches = run_token(tok, pos, caches)
        nxt = jnp.argmax(logits.astype(jnp.float32), axis=-1).astype(
            jnp.int32)
        nxt = jnp.where(finished, PAD_ID, nxt)
        finished = finished | (nxt == EOS_ID)
        return (nxt, finished, caches), nxt

    (_, _, _), toks = jax.lax.scan(
        step, (task_tok, jnp.zeros((b,), bool), caches),
        jnp.arange(1, max_len - 1))
    tokens = jnp.concatenate(
        [tok0[:, None], task_tok[:, None], jnp.moveaxis(toks, 0, 1)], axis=1)
    lengths = jnp.sum((tokens != PAD_ID).astype(jnp.int32), axis=1)
    return tokens, lengths


class Florence:
    """Host wrapper: caption() and detect() surfaces."""

    def __init__(self, cfg: Optional[FlorenceConfig] = None, seed: int = 0,
                 params: Optional[Params] = None,
                 tokenizer: Optional[Tokenizer] = None):
        self.cfg = cfg or FlorenceConfig.tiny()
        self.params = params or init_florence(jax.random.PRNGKey(seed),
                                              self.cfg)
        self.tokenizer = tokenizer or default_tokenizer(self.cfg.text_vocab)

    def caption(self, images_u8: np.ndarray) -> List[str]:
        toks, _ = generate(self.params, jnp.asarray(images_u8), self.cfg,
                           task=TASK_CAPTION)
        out = []
        for row in np.asarray(toks):
            ids = [int(t) for t in row[2:]
                   if t < self.cfg.text_vocab]  # strip loc/task/class ids
            out.append(self.tokenizer.decode(ids))
        return out

    def detect(self, images_u8: np.ndarray):
        """Detection-as-language. Location bins are decoded into INPUT-image
        pixel coordinates (bins are relative; the ViT resizes internally,
        so decoding at cfg.vision.image_size would return boxes in the
        model's internal frame, not the caller's)."""
        toks, _ = generate(self.params, jnp.asarray(images_u8), self.cfg,
                           task=TASK_OD)
        side = images_u8.shape[1]
        return [decode_od_sequence(row[2:], side, self.cfg)
                for row in np.asarray(toks)]
