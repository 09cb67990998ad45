"""Instance detector: FPN backbone + RPN + ROI box/mask heads, XLA-native.

Mask R-CNN-class design replacing the reference's detectron2/HF-Mask2Former
stack (ref: experimenting_env/utils/predictor_utils.py:210-379 runtime
detector; experimenting_env/detector/model/multi_stage_models.py:254-330
trainable path; utils/roi_head_wrappers.py head-loss family). Everything is
fixed-shape: `pre_nms_topk` proposals via top-k, `num_proposals` ROIs after
NMS, `max_detections` padded outputs with validity masks — so the whole
forward compiles to one XLA program with convs/matmuls in bfloat16 on the MXU.

Output contract (parity with the reference's Predictor.forward postprocess,
ref: predictor_utils.py:338-379): per frame a Detections struct with XYXY
boxes, local classes 0..5, scores, per-class `logits` (the ref's `gt_logits`),
and ROI masks pasted to full frame on demand.

Head-loss variants (ref: utils/roi_head_wrappers.py):
  ce         standard softmax CE (BoxPredictorWrapper)
  soft       distillation on soft `gt_logits` w/ temperature+alpha
             (SoftHeadWrapper :184-308)
  focal      focal loss x10 (FocalHeadWrapper :311-364)
  softfocal  focal on soft targets (SoftFocalHeadWrapper)
  msefocal   MSE on probs + focal (MSEFocalHeadWrapper)
MC-dropout inference (MonteCarloPredictor, predictor_utils.py:515-602) is
provided by `forward_mc` with dropout rng.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import DetectorConfig
from ..ops.detections import Detections, pairwise_iou
from ..ops.image import paste_masks, roi_align
from ..ops.nms import class_aware_nms_topk, nms_topk
from .common import Params, dense, dense_init

# ---------------------------------------------------------------------------
# conv primitives
# ---------------------------------------------------------------------------


def conv_init(key, k: int, c_in: int, c_out: int) -> Params:
    fan_in = k * k * c_in
    return {
        "w": jax.random.normal(key, (k, k, c_in, c_out), jnp.float32)
        * math.sqrt(2.0 / fan_in),
        "b": jnp.zeros((c_out,), jnp.float32),
    }


def conv(p: Params, x: jnp.ndarray, stride: int = 1,
         compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    # bf16 in / bf16 out (MXU accumulates f32 internally): the feature
    # stream between convs stays bf16, halving the backbone's HBM traffic —
    # decisive at the 1024^2+ reference resolution where activations are
    # hundreds of MB. Bias is added in f32, then the result is cast back.
    # Mixed-dtype operands with preferred_element_type break the conv
    # transpose rule, so the casts are explicit.
    from .quantize import maybe_dequant

    y = jax.lax.conv_general_dilated(
        x.astype(compute_dtype), maybe_dequant(p["w"], compute_dtype),
        window_strides=(stride, stride), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return (y.astype(jnp.float32) + p["b"]).astype(compute_dtype)


def gn_init(c: int) -> Params:
    return {"g": jnp.ones((c,), jnp.float32), "b": jnp.zeros((c,), jnp.float32)}


def groupnorm(p: Params, x: jnp.ndarray, groups: int = 8,
              eps: float = 1e-5) -> jnp.ndarray:
    """Stats in f32; output back in the input dtype (bf16 stream)."""
    in_dtype = x.dtype
    n, h, w, c = x.shape
    g = min(groups, c)
    x = x.astype(jnp.float32).reshape(n, h, w, g, c // g)
    mean = jnp.mean(x, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(x, axis=(1, 2, 4), keepdims=True)
    x = (x - mean) * jax.lax.rsqrt(var + eps)
    return (x.reshape(n, h, w, c) * p["g"] + p["b"]).astype(in_dtype)


def affine_norm(p: Params, x: jnp.ndarray, groups: int = 8,
                eps: float = 1e-5) -> jnp.ndarray:
    """FrozenBatchNorm-style per-channel affine (detectron2's R50 backbone
    norm at inference — running stats folded into scale/bias). No data
    statistics, so XLA fuses it into the conv epilogue: zero extra HBM
    passes, vs GroupNorm's reduce+normalize re-reads which measured ~2.5x
    the backbone time at 1024^2 (docs/BENCH.md round-3 split). Selected by
    DetectorConfig(norm="affine") — the serving-scale presets; the
    trainable tiny/base presets keep GroupNorm."""
    return (x.astype(jnp.float32) * p["g"] + p["b"]).astype(x.dtype)


_NORM_OVERRIDE = None  # calibration hook (see calibrate_affine)


def norm_fn(cfg: DetectorConfig):
    if _NORM_OVERRIDE is not None:
        return _NORM_OVERRIDE
    return affine_norm if cfg.norm == "affine" else groupnorm


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

ANCHOR_RATIOS = (0.5, 1.0, 2.0)
ANCHOR_SCALES = (2.0, 4.0, 8.0)  # x stride
NUM_ANCHORS = len(ANCHOR_RATIOS) * len(ANCHOR_SCALES)


def init_detector(key, cfg: DetectorConfig) -> Params:
    """Family dispatch: the FPN/RPN/ROI stack (default) or the
    Mask2Former-class query head (`cfg.family="query"`,
    models/query_detector.py) — both share the backbone+FPN schema."""
    if cfg.family == "query":
        from .query_detector import init_query_detector

        return init_query_detector(key, cfg)
    return init_rcnn_detector(key, cfg)


def init_rcnn_detector(key, cfg: DetectorConfig) -> Params:
    w = cfg.backbone_width
    bottleneck = cfg.block == "bottleneck"
    expansion = 4 if bottleneck else 1
    mids = [w, 2 * w, 4 * w, 8 * w]
    widths = [m * expansion for m in mids]
    ks = iter(jax.random.split(key, 256))
    params: Params = {"stem": conv_init(next(ks), 3, 3, w),
                      "stem_gn": gn_init(w)}
    # residual stages (basic: 3x3-3x3; bottleneck: 1x1-3x3-1x1 with 4x
    # expansion — the ResNet-50 family for the reference-scale preset)
    stages = []
    c_in = w
    for si, depth in enumerate(cfg.backbone_depths):
        c_out, mid = widths[si], mids[si]
        blocks = []
        for bi in range(depth):
            b_in = c_in if bi == 0 else c_out
            if bottleneck:
                blocks.append({
                    "c1": conv_init(next(ks), 1, b_in, mid),
                    "g1": gn_init(mid),
                    "c2": conv_init(next(ks), 3, mid, mid),
                    "g2": gn_init(mid),
                    "c3": conv_init(next(ks), 1, mid, c_out),
                    "g3": gn_init(c_out),
                    "sc": (conv_init(next(ks), 1, b_in, c_out)
                           if bi == 0 else None),
                })
            else:
                blocks.append({
                    "c1": conv_init(next(ks), 3, b_in, c_out),
                    "g1": gn_init(c_out),
                    "c2": conv_init(next(ks), 3, c_out, c_out),
                    "g2": gn_init(c_out),
                    "sc": (conv_init(next(ks), 1, b_in, c_out)
                           if (bi == 0 and c_in != c_out) else None),
                })
        stages.append(blocks)
        c_in = c_out
    params["stages"] = stages
    # FPN over the included levels only (min_level drops finer ones)
    d = cfg.fpn_dim
    fpn_widths = widths[cfg.min_level:]
    params["fpn_lat"] = [conv_init(next(ks), 1, c, d) for c in fpn_widths]
    params["fpn_out"] = [conv_init(next(ks), 3, d, d) for _ in fpn_widths]
    # RPN (shared across levels)
    params["rpn_conv"] = conv_init(next(ks), 3, d, d)
    params["rpn_obj"] = conv_init(next(ks), 1, d, NUM_ANCHORS)
    params["rpn_box"] = conv_init(next(ks), 1, d, NUM_ANCHORS * 4)
    # box head
    roi_feat = cfg.roi_size * cfg.roi_size * d
    params["box_fc1"] = dense_init(next(ks), roi_feat, 1024)
    params["box_fc2"] = dense_init(next(ks), 1024, 1024)
    params["cls"] = dense_init(next(ks), 1024, cfg.num_classes + 1, scale=0.01)
    params["box"] = dense_init(next(ks), 1024, 4, scale=0.001)
    # contrastive projection head (ref: multi_stage_models.py:73
    # triplet.tinyprojection_MLP(1024, 128))
    params["proj_fc"] = dense_init(next(ks), 1024, 512)
    params["proj_out"] = dense_init(next(ks), 512, 128)
    # mask head
    params["mask_convs"] = [conv_init(next(ks), 3, d, d) for _ in range(4)]
    params["mask_gns"] = [gn_init(d) for _ in range(4)]
    params["mask_out"] = conv_init(next(ks), 1, d, cfg.num_classes)
    return params


def fold_affine(params: Params, cfg: DetectorConfig) -> Params:
    """Serving-time transform for norm='affine' presets: absorb each
    per-channel affine norm into its preceding conv (w' = w*g,
    b' = b_conv*g + b_norm) and neutralize the norm params (g=1, b=0).
    Exact — affine norm has no data statistics. Lets XLA see one fewer
    elementwise op per conv; measured impact via scripts/probe_backbone.py.
    """
    if cfg.norm != "affine":
        raise ValueError("fold_affine requires norm='affine'")
    if cfg.family == "query":
        raise ValueError("fold_affine supports the rcnn family only")

    def fold(c: Params, g: Params) -> Tuple[Params, Params]:
        from .quantize import QuantizedArray

        if isinstance(c["w"], QuantizedArray):
            raise ValueError(
                "fold_affine must run BEFORE quantize_params (the fold "
                "rescales float weights; per-channel int8 then absorbs the "
                "scale losslessly)")
        w = jnp.asarray(c["w"], jnp.float32)
        cnew = {"w": w * g["g"], "b": c["b"] * g["g"] + g["b"]}
        gnew = {"g": jnp.ones_like(g["g"]), "b": jnp.zeros_like(g["b"])}
        return cnew, gnew

    p = dict(params)  # apply BEFORE quantize_params (folds float weights)
    p["stem"], p["stem_gn"] = fold(params["stem"], params["stem_gn"])
    stages = []
    for blocks in params["stages"]:
        nb = []
        for blk in blocks:
            b2 = dict(blk)
            for ci, gi in (("c1", "g1"), ("c2", "g2"), ("c3", "g3")):
                if ci in blk:
                    b2[ci], b2[gi] = fold(blk[ci], blk[gi])
            nb.append(b2)
        stages.append(nb)
    p["stages"] = stages
    p["mask_convs"], p["mask_gns"] = map(list, zip(*[
        fold(c, g) for c, g in zip(params["mask_convs"],
                                   params["mask_gns"])]))
    return p


def _norm_sites(params: Params):
    """Norm-site key paths in FORWARD CALL ORDER (stem, stages in order
    with g1/g2[/g3] per block, then the 4 mask-head GNs) — must mirror
    backbone_fpn/_mask_head exactly; calibrate_affine zips recorded
    statistics against this order."""
    sites = [("stem_gn",)]
    for si, blocks in enumerate(params["stages"]):
        for bi, blk in enumerate(blocks):
            sites.append(("stages", si, bi, "g1"))
            sites.append(("stages", si, bi, "g2"))
            if "c3" in blk:
                sites.append(("stages", si, bi, "g3"))
    for i in range(len(params["mask_gns"])):
        sites.append(("mask_gns", i))
    return sites


def calibrate_affine(params: Params, image_batches, cfg: DetectorConfig,
                     eps: float = 1e-5) -> Params:
    """GroupNorm-trained params -> frozen per-channel affine params
    (FrozenBatchNorm semantics: detectron2's R50 serves with data
    statistics baked into scale/bias, ref: utils/predictor_utils.py R50
    path / detectron2 FrozenBatchNorm2d). Runs the full forward over the
    calibration batches with a recording norm hook, pools each GN site's
    per-group moments over the whole calibration set, and rewrites g/b so
    `affine_norm` reproduces GroupNorm under those frozen statistics:

        scale_c = g_c / sqrt(var_group(c) + eps)
        bias_c  = b_c - g_c * mean_group(c) / sqrt(var_group(c) + eps)

    The result serves under DetectorConfig(norm="affine") and composes
    with fold_affine + quantize_params (serving order: calibrate -> fold
    -> quantize). Exact when the calibration statistics equal the
    per-image GN statistics (tested); approximate otherwise — exactly the
    BN->FrozenBN trade every detectron2 serving model already makes."""
    import numpy as np

    global _NORM_OVERRIDE
    if cfg.family == "query":
        raise ValueError("calibrate_affine supports the rcnn family only")
    if cfg.norm != "gn":
        raise ValueError("calibrate_affine converts gn-trained params")

    trace: list = []

    def rec(p, x, groups: int = 8, eps_: float = 1e-5):
        xf = x.astype(jnp.float32)
        red = tuple(range(xf.ndim - 1))  # all but channels
        trace.append(jnp.stack([jnp.mean(xf, red), jnp.mean(xf * xf, red)]))
        return groupnorm(p, x, groups, eps_)

    raw_forward = forward.__wrapped__  # unjitted (jit would cache past rec)
    sites = _norm_sites(params)
    n_mask = len(params["mask_gns"])
    n_backbone = len(sites) - n_mask

    def run(p, images):
        # backbone/FPN sites record batched (no vmap in backbone_fpn);
        # the mask head lives under vmap(finalize) inside forward, whose
        # batch tracers cannot escape — so detections come from an
        # un-recorded forward pass and the mask head is replayed per image
        # with the SAME refined boxes/classes the serving path feeds it
        global _NORM_OVERRIDE
        trace.clear()
        images_f = images.astype(jnp.float32) / 255.0
        fpn0 = backbone_fpn(p, images_f, cfg)[0]
        saved, _NORM_OVERRIDE = _NORM_OVERRIDE, None
        try:
            det = raw_forward(p, images, cfg, with_masks=False)
        finally:
            _NORM_OVERRIDE = saved
        for b in range(images.shape[0]):
            _mask_head(p, fpn0[b], det.boxes[b], det.classes[b], cfg)
        return list(trace)

    run_j = jax.jit(run)
    _NORM_OVERRIDE = rec
    try:
        pooled = None
        n = 0
        for images in image_batches:
            raw = [np.asarray(t, np.float64) for t in run_j(params, images)]
            nimg = (len(raw) - n_backbone) // n_mask
            out = raw[:n_backbone] + [
                np.mean([raw[n_backbone + i * n_mask + m]
                         for i in range(nimg)], axis=0)
                for m in range(n_mask)]
            pooled = (out if pooled is None
                      else [a + b for a, b in zip(pooled, out)])
            n += 1
    finally:
        _NORM_OVERRIDE = None
    pooled = [s / n for s in pooled]

    assert len(sites) == len(pooled), (len(sites), len(pooled))

    def get(tree, path):
        node = tree
        for k in path:
            node = node[k]
        return node

    new_params = jax.tree_util.tree_map(lambda x: x, params)  # deep copy
    for path, stat in zip(sites, pooled):
        site = get(new_params, path)
        g = np.asarray(site["g"], np.float64)
        b = np.asarray(site["b"], np.float64)
        c = g.shape[0]
        ng = min(8, c)  # groupnorm's default grouping
        mean_c, meansq_c = stat[0], stat[1]
        mu_g = mean_c.reshape(ng, c // ng).mean(axis=1)
        var_g = meansq_c.reshape(ng, c // ng).mean(axis=1) - mu_g ** 2
        inv = 1.0 / np.sqrt(np.maximum(var_g, 0.0) + eps)
        mu_c = np.repeat(mu_g, c // ng)
        inv_c = np.repeat(inv, c // ng)
        site["g"] = jnp.asarray(g * inv_c, jnp.float32)
        site["b"] = jnp.asarray(b - g * mu_c * inv_c, jnp.float32)
    return new_params


# ---------------------------------------------------------------------------
# backbone + FPN
# ---------------------------------------------------------------------------


def _stem_s2d(p: Params, images: jnp.ndarray,
              compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """EXACT rewrite of the 3x3-stride-2 stem conv as space-to-depth(2) +
    2x2-stride-1 conv with rearranged weights. XLA's SAME padding for even
    input (stride 2, k=3) is (low 0, high 1), so output(i,j) reads input
    rows 2i..2i+2 — covered by the 2x2 window over depth-2 blocks i..i+1:
    w2[A, B, (a,b,c)] = w[2A+a, 2B+b, c] when the tap 2A+a <= 2 exists,
    else zero. Same logical params — flip via DetectorConfig.stem_s2d,
    equality-tested (tests/test_detector_large.py)."""
    from .quantize import maybe_dequant

    b, s, _, c = images.shape
    w = maybe_dequant(p["w"], jnp.float32)  # [3, 3, c, w]
    cout = w.shape[-1]
    # scatter the 3x3 taps into the (A, B, a, b, c) window
    w2 = jnp.zeros((2, 2, 2, 2, c, cout), jnp.float32)
    for ai in range(2):      # A (block row offset)
        for a in range(2):   # a (row within block)
            u = 2 * ai + a   # input row offset relative to 2i
            if u > 2:
                continue
            for bi in range(2):
                for bb in range(2):
                    v = 2 * bi + bb
                    if v > 2:
                        continue
                    w2 = w2.at[ai, bi, a, bb].set(w[u, v])
    # both sides pack the depth as (a, b, c)
    w2 = w2.reshape(2, 2, 4 * c, cout)
    xs = images.reshape(b, s // 2, 2, s // 2, 2, c)
    xs = jnp.transpose(xs, (0, 1, 3, 2, 4, 5)).reshape(
        b, s // 2, s // 2, 4 * c)
    y = jax.lax.conv_general_dilated(
        xs.astype(compute_dtype), w2.astype(compute_dtype),
        window_strides=(1, 1), padding=((0, 1), (0, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return (y.astype(jnp.float32) + p["b"]).astype(compute_dtype)


def backbone_fpn(params: Params, images: jnp.ndarray, cfg: DetectorConfig
                 ) -> List[jnp.ndarray]:
    """float images [B, S, S, 3] (0..1, normalized outside) -> FPN levels
    at `cfg.fpn_strides`, each [B, S/s, S/s, fpn_dim]. The finest returned
    level (index 0) is where ROI pooling happens."""
    gn = norm_fn(cfg)
    stem = (_stem_s2d(params["stem"], images) if cfg.stem_s2d
            else conv(params["stem"], images, stride=2))
    x = jax.nn.relu(gn(params["stem_gn"], stem))
    # stride-2 max pool so stage outputs sit at strides 4/8/16/32 (matching
    # the anchor grid)
    # init value must be a CONCRETE scalar of the operand dtype (a traced
    # array breaks reduce_window's autodiff)
    neg = x.dtype.type(-jnp.inf)
    x = jax.lax.reduce_window(x, neg, jax.lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1), "SAME")
    feats = []
    for si, blocks in enumerate(params["stages"]):
        for bi, blk in enumerate(blocks):
            stride = 2 if (bi == 0 and si > 0) else 1
            if "c3" in blk:  # bottleneck: 1x1 reduce, 3x3 (strided), 1x1
                h = jax.nn.relu(gn(blk["g1"], conv(blk["c1"], x)))
                h = jax.nn.relu(gn(blk["g2"], conv(blk["c2"], h,
                                                   stride=stride)))
                h = gn(blk["g3"], conv(blk["c3"], h))
                # stage starts always project (channels change)
                if blk["sc"] is not None:
                    sc = conv(blk["sc"], x, stride=stride)
                elif stride == 2:
                    sc = x[:, ::2, ::2, :]
                else:
                    sc = x
            else:  # basic: 3x3 (strided) + 3x3
                h = jax.nn.relu(gn(blk["g1"], conv(blk["c1"], x,
                                                   stride=stride)))
                h = gn(blk["g2"], conv(blk["c2"], h))
                if stride == 2 or blk["sc"] is not None:
                    sc = x if blk["sc"] is None else conv(blk["sc"], x)
                    if stride == 2:
                        sc = sc[:, ::2, ::2, :]
                else:
                    sc = x
            x = jax.nn.relu(h + sc)
        feats.append(x)
    feats = feats[cfg.min_level:]
    # top-down FPN
    lats = [conv(l, f) for l, f in zip(params["fpn_lat"], feats)]
    outs: List[jnp.ndarray] = [None] * len(lats)
    prev = lats[-1]
    outs[-1] = conv(params["fpn_out"][-1], prev)
    for i in range(len(lats) - 2, -1, -1):
        up = jnp.repeat(jnp.repeat(prev, 2, axis=1), 2, axis=2)
        prev = lats[i] + up
        outs[i] = conv(params["fpn_out"][i], prev)
    if cfg.add_p6:  # stride-64 RPN level (detectron2 LastLevelMaxPool)
        outs.append(jax.lax.reduce_window(
            outs[-1], outs[-1].dtype.type(-jnp.inf), jax.lax.max,
            (1, 1, 1, 1), (1, 2, 2, 1), "SAME"))
    return outs


# ---------------------------------------------------------------------------
# anchors & box coding
# ---------------------------------------------------------------------------


def level_anchors(size: int, stride: int) -> jnp.ndarray:
    """[Hl*Wl*A, 4] XYXY anchors for one level (3 scales x 3 ratios)."""
    hl = size // stride
    ys = (jnp.arange(hl) + 0.5) * stride
    xs = (jnp.arange(hl) + 0.5) * stride
    cy, cx = jnp.meshgrid(ys, xs, indexing="ij")
    anchors = []
    for s in ANCHOR_SCALES:
        base = s * stride
        for r in ANCHOR_RATIOS:
            w = base * math.sqrt(1.0 / r)
            h = base * math.sqrt(r)
            anchors.append(jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2,
                                      cy + h / 2], axis=-1))
    return jnp.stack(anchors, axis=2).reshape(-1, 4)


def all_anchors(size: int, strides: Tuple[int, ...] = (4, 8, 16, 32)
                ) -> jnp.ndarray:
    return jnp.concatenate([level_anchors(size, s) for s in strides], axis=0)


# detectron2's Box2BoxTransform weights: the ROI stage scales its regression
# targets by (10, 10, 5, 5), amplifying the localization learning signal ~10x
# relative to raw deltas (RPN uses (1, 1, 1, 1)).
ROI_BOX_WEIGHTS = (10.0, 10.0, 5.0, 5.0)
RPN_BOX_WEIGHTS = (1.0, 1.0, 1.0, 1.0)


def decode_boxes(anchors: jnp.ndarray, deltas: jnp.ndarray, size: int,
                 weights: Tuple[float, ...] = RPN_BOX_WEIGHTS) -> jnp.ndarray:
    """(dx, dy, dw, dh) deltas -> XYXY, clipped to the image."""
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    ax = (anchors[:, 0] + anchors[:, 2]) / 2
    ay = (anchors[:, 1] + anchors[:, 3]) / 2
    wx, wy, ww, wh = weights
    dx, dy = deltas[:, 0] / wx, deltas[:, 1] / wy
    dw, dh = deltas[:, 2] / ww, deltas[:, 3] / wh
    cx = ax + dx * aw
    cy = ay + dy * ah
    w = aw * jnp.exp(jnp.clip(dw, -4.0, 4.0))
    h = ah * jnp.exp(jnp.clip(dh, -4.0, 4.0))
    boxes = jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                      axis=-1)
    return jnp.clip(boxes, 0.0, size)


def encode_boxes(anchors: jnp.ndarray, boxes: jnp.ndarray,
                 weights: Tuple[float, ...] = RPN_BOX_WEIGHTS) -> jnp.ndarray:
    aw = jnp.maximum(anchors[:, 2] - anchors[:, 0], 1e-3)
    ah = jnp.maximum(anchors[:, 3] - anchors[:, 1], 1e-3)
    ax = (anchors[:, 0] + anchors[:, 2]) / 2
    ay = (anchors[:, 1] + anchors[:, 3]) / 2
    bw = jnp.maximum(boxes[:, 2] - boxes[:, 0], 1e-3)
    bh = jnp.maximum(boxes[:, 3] - boxes[:, 1], 1e-3)
    bx = (boxes[:, 0] + boxes[:, 2]) / 2
    by = (boxes[:, 1] + boxes[:, 3]) / 2
    wx, wy, ww, wh = weights
    return jnp.stack([wx * (bx - ax) / aw, wy * (by - ay) / ah,
                      ww * jnp.log(bw / aw), wh * jnp.log(bh / ah)], axis=-1)


# ---------------------------------------------------------------------------
# forward pieces
# ---------------------------------------------------------------------------


class DetectorIntermediates(NamedTuple):
    proposals: jnp.ndarray       # [B, P, 4]
    proposal_valid: jnp.ndarray  # [B, P]
    roi_features: jnp.ndarray    # [B, P, 1024]
    class_logits: jnp.ndarray    # [B, P, C+1]
    box_deltas: jnp.ndarray      # [B, P, 4]
    rpn_obj: jnp.ndarray         # [B, A_total]
    rpn_deltas: jnp.ndarray      # [B, A_total, 4]
    fpn: Any                     # list of level features


def _rpn_head(params: Params, fpn: List[jnp.ndarray]):
    objs, deltas = [], []
    for f in fpn:
        h = jax.nn.relu(conv(params["rpn_conv"], f))
        o = conv(params["rpn_obj"], h)
        d = conv(params["rpn_box"], h)
        b = o.shape[0]
        objs.append(o.reshape(b, -1))
        deltas.append(d.reshape(b, -1, 4))
    return jnp.concatenate(objs, axis=1), jnp.concatenate(deltas, axis=1)


def _propose(obj: jnp.ndarray, deltas: jnp.ndarray, anchors: jnp.ndarray,
             cfg: DetectorConfig):
    """Per-image: top-k by objectness, decode, NMS -> [P, 4] proposals."""
    k = cfg.pre_nms_topk
    if cfg.approx_topk:
        # approx_max_k: TPU-native bucketed top-k (exact full sort over the
        # 131k-anchor objectness profiled 1.66 ms/batch at 8 GB/s). The RPN
        # candidate set is a recall heuristic and the argmax-NMS below needs
        # no input ordering; serving preset only — the trained/validated
        # recipe keeps exact top_k (config.approx_topk).
        scores, idx = jax.lax.approx_max_k(obj, k, recall_target=0.95)
    else:
        scores, idx = jax.lax.top_k(obj, k)
    boxes = decode_boxes(anchors[idx], deltas[idx], cfg.image_size)
    keep_idx, keep_ok = nms_topk(boxes, scores, 0.7, cfg.num_proposals)
    props = boxes[keep_idx]
    # degenerate boxes invalid
    wh_ok = ((props[:, 2] - props[:, 0]) > 1.0) & \
            ((props[:, 3] - props[:, 1]) > 1.0)
    return props, keep_ok & wh_ok


def _box_head(params: Params, feat: jnp.ndarray, proposals: jnp.ndarray,
              cfg: DetectorConfig, dropout_rng=None, dropout_rate: float = 0.0):
    """ROI-align on the finest FPN level + 2-FC head -> (features, class
    logits, box deltas)."""
    feats = roi_align(feat, proposals, cfg.roi_size,
                      spatial_scale=1.0 / cfg.fpn_strides[0])
    x = feats.reshape(proposals.shape[0], -1)
    x = jax.nn.relu(dense(params["box_fc1"], x))
    if dropout_rng is not None and dropout_rate > 0:
        keep = jax.random.bernoulli(dropout_rng, 1 - dropout_rate, x.shape)
        x = jnp.where(keep, x / (1 - dropout_rate), 0.0)
    x = jax.nn.relu(dense(params["box_fc2"], x))
    return x, dense(params["cls"], x), dense(params["box"], x)


def reinit_heads(params: Params, key, cfg: DetectorConfig) -> Params:
    """Re-initialize classification/box/mask output heads, keeping the
    backbone (the reference's COCO-head pruning / `reinit_head` and the
    pipeline's `reinit_online` student reset,
    ref: utils/predictor_utils.py:409-459, utils/roi_head_wrappers.py:29-50,
    pipelines.py:838-858)."""
    k1, k2, k3 = jax.random.split(key, 3)
    out = dict(params)
    if cfg.family == "query":
        d = cfg.fpn_dim
        out["cls"] = dense_init(k1, d, cfg.num_classes + 1, scale=0.01)
        out["mask_fc1"] = dense_init(k2, d, d)
        out["mask_fc2"] = dense_init(k3, d, d)
        return out
    out["cls"] = dense_init(k1, 1024, cfg.num_classes + 1, scale=0.01)
    out["box"] = dense_init(k2, 1024, 4, scale=0.001)
    out["mask_out"] = conv_init(k3, 1, cfg.fpn_dim, cfg.num_classes)
    return out


def project_features(params: Params, roi_features: jnp.ndarray) -> jnp.ndarray:
    """128-d contrastive projection of ROI features (ref:
    multi_stage_models.py:73,116-131), L2-normalized."""
    h = jax.nn.relu(dense(params["proj_fc"], roi_features))
    z = dense(params["proj_out"], h)
    return z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-8)


def _mask_head(params: Params, feat: jnp.ndarray, boxes: jnp.ndarray,
               classes: jnp.ndarray, cfg: DetectorConfig) -> jnp.ndarray:
    """[N, mask_size, mask_size] logits for the predicted class."""
    x = roi_align(feat, boxes, cfg.mask_roi_size,
                  spatial_scale=1.0 / cfg.fpn_strides[0])
    nrm = norm_fn(cfg)
    for cv, gp in zip(params["mask_convs"], params["mask_gns"]):
        x = jax.nn.relu(nrm(gp, conv(cv, x)))
    x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)  # 14 -> 28
    logits = conv(params["mask_out"], x)  # [N, m, m, C]
    sel = jnp.clip(classes, 0, cfg.num_classes - 1)
    return jnp.take_along_axis(
        logits, sel[:, None, None, None], axis=-1)[..., 0]


def _intermediates(params: Params, images: jnp.ndarray, cfg: DetectorConfig,
                   dropout_rng=None, dropout_rate: float = 0.0,
                   gt_boxes: Optional[jnp.ndarray] = None,
                   gt_valid: Optional[jnp.ndarray] = None,
                   ) -> DetectorIntermediates:
    fpn = backbone_fpn(params, images, cfg)
    obj, deltas = _rpn_head(params, fpn)
    anchors = all_anchors(cfg.image_size, cfg.fpn_strides)
    props, pvalid = jax.vmap(lambda o, d: _propose(o, d, anchors, cfg))(
        obj, deltas)
    if gt_boxes is not None:
        # training only: splice GT boxes into the proposal set (detectron2's
        # add_gt_proposals) — guarantees clean foreground ROIs and breaks
        # the RPN/ROI-head chicken-and-egg on cold starts
        g = gt_boxes.shape[1]
        props = jnp.concatenate([props[:, :-g], gt_boxes], axis=1)
        pvalid = jnp.concatenate(
            [pvalid[:, :-g],
             gt_valid if gt_valid is not None
             else jnp.ones(gt_boxes.shape[:2], bool)], axis=1)
    # proposals are training constants for the ROI head (detectron2 detaches
    # them as well); also keeps grads from flowing through the NMS scan,
    # which would blow up the backward graph
    props = jax.lax.stop_gradient(props)
    pvalid = jax.lax.stop_gradient(pvalid)
    if dropout_rng is not None:
        rngs = jax.random.split(dropout_rng, images.shape[0])
    else:
        rngs = [None] * images.shape[0]

    def head(p2, pr, rng):
        return _box_head(params, p2, pr, cfg, rng, dropout_rate)

    if dropout_rng is not None:
        feats, cls_logits, box_deltas = jax.vmap(head)(fpn[0], props, rngs)
    else:
        feats, cls_logits, box_deltas = jax.vmap(
            lambda p2, pr: _box_head(params, p2, pr, cfg))(fpn[0], props)
    return DetectorIntermediates(props, pvalid, feats, cls_logits, box_deltas,
                                 obj, deltas, fpn)


# ---------------------------------------------------------------------------
# inference
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg", "with_masks"))
def forward(params: Params, images_u8: jnp.ndarray, cfg: DetectorConfig,
            with_masks: bool = True) -> Detections:
    """uint8 [B, S, S, 3] -> batched Detections (padded to max_detections).

    Postprocess parity with the reference runtime detector
    (ref: predictor_utils.py:338-379): score threshold, per-class NMS, local
    classes 0..5, per-class probability vector in `logits`, ROI masks.

    Accepts uint8 frames or float frames on the same 0..255 scale — the
    fused perception program feeds the on-device resize output directly
    (skipping a uint8 round-trip re-materializes ~50 MB/batch and a layout
    copy; the reference's HF processor never re-rounds to uint8 either,
    ref: predictor_utils.py:308-379).
    """
    if cfg.family == "query":
        from .query_detector import forward_query

        return forward_query(params, images_u8, cfg, with_masks=with_masks)
    images = images_u8.astype(jnp.float32) / 255.0
    inter = _intermediates(params, images, cfg)

    def finalize(p2, props, pvalid, cls_logits, box_deltas):
        probs = jax.nn.softmax(cls_logits.astype(jnp.float32), axis=-1)
        fg = probs[:, :-1]
        scores = jnp.max(fg, axis=-1)
        classes = jnp.argmax(fg, axis=-1).astype(jnp.int32)
        boxes = decode_boxes(props, box_deltas, cfg.image_size,
                             weights=ROI_BOX_WEIGHTS)
        ok = pvalid & (scores > cfg.score_threshold)
        idx, keep = class_aware_nms_topk(boxes, scores, classes,
                                         cfg.nms_iou_threshold,
                                         cfg.max_detections, ok)
        det_boxes = boxes[idx]
        det_classes = classes[idx]
        det_scores = scores[idx]
        det_logits = fg[idx]
        # cascade-lite box refinement: re-pool the selected boxes and run
        # the (shared-weight) box head once more — the head was trained on
        # proposals of every quality incl. spliced GT, so a second decode
        # step contracts loose boxes toward the object (classes/scores stay
        # from pass 1; refining only geometry cannot create NMS duplicates)
        _, _, deltas2 = _box_head(params, p2, det_boxes, cfg)
        det_boxes = decode_boxes(det_boxes, deltas2, cfg.image_size,
                                 weights=ROI_BOX_WEIGHTS)
        if with_masks:
            det_masks = _mask_head(params, p2, det_boxes, det_classes, cfg)
            det_masks = jax.nn.sigmoid(det_masks) * keep[:, None, None]
        else:
            det_masks = jnp.zeros((cfg.max_detections, cfg.mask_size,
                                   cfg.mask_size))
        return Detections(
            boxes=det_boxes * keep[:, None], classes=det_classes * keep,
            scores=det_scores * keep, logits=det_logits * keep[:, None],
            valid=keep, masks=det_masks)

    return jax.vmap(finalize)(inter.fpn[0], inter.proposals,
                              inter.proposal_valid, inter.class_logits,
                              inter.box_deltas)


def full_masks(det: Detections, size: int, src_size: int = 0) -> jnp.ndarray:
    """Paste per-detection ROI masks to full frame [B, N, size, size].

    `src_size` is the pixel space the boxes live in (the detector input
    size); when it differs from `size` the boxes are rescaled, so the large
    preset can paste its 1024^2-space detections at a cheaper raster
    (cfg.paste_size) — mask probabilities are resolution-independent."""
    scale = size / (src_size or size)
    return jax.vmap(lambda m, b: paste_masks(m, b * scale, size, size))(
        det.masks, det.boxes)


def flip_detections(det: Detections, size: float) -> Detections:
    """Mirror detections of a horizontally flipped image back into original
    image coordinates: boxes get x -> size - x (ends swapped); ROI mask
    crops live in box-local coordinates, so their content mirrors along
    their own x axis. Class/score/logits are geometry-free."""
    b = det.boxes
    flipped = jnp.stack([size - b[..., 2], b[..., 1],
                         size - b[..., 0], b[..., 3]], axis=-1)
    flipped = flipped * det.valid[..., None]
    masks = det.masks[..., ::-1] if det.masks is not None else None
    return det.replace(boxes=flipped, masks=masks)


@functools.partial(jax.jit, static_argnames=("cfg", "with_masks"))
def forward_tta(params: Params, images_u8: jnp.ndarray, cfg: DetectorConfig,
                with_masks: bool = True) -> Detections:
    """Horizontal-flip test-time augmentation: forward on the frame and its
    mirror, un-mirror the second pass, and merge the union with one more
    round of per-class NMS (union-NMS TTA). Evaluation-time only — the
    serving path stays single-pass. Works for both detector families (the
    merge runs on the padded Detections contract, not on internals).

    The reference has no TTA; this is a quality knob the fixed-shape
    formulation gets almost for free (the second pass reuses the same
    compiled program on a reversed view)."""
    det_a = forward(params, images_u8, cfg, with_masks=with_masks)
    det_b = forward(params, images_u8[:, :, ::-1, :], cfg,
                    with_masks=with_masks)
    det_b = flip_detections(det_b, float(cfg.image_size))
    cat = jax.tree_util.tree_map(
        lambda a, b: jnp.concatenate([a, b], axis=1), det_a, det_b)

    def merge(d: Detections) -> Detections:
        idx, keep = class_aware_nms_topk(d.boxes, d.scores, d.classes,
                                         cfg.nms_iou_threshold,
                                         cfg.max_detections, d.valid)
        out = jax.tree_util.tree_map(lambda a: a[idx], d)
        return out.replace(
            boxes=out.boxes * keep[:, None],
            classes=out.classes * keep,
            scores=out.scores * keep,
            logits=out.logits * keep[:, None],
            valid=keep,
            masks=(out.masks * keep[:, None, None]
                   if out.masks is not None else None))

    return jax.vmap(merge)(cat)


@functools.partial(jax.jit, static_argnames=("cfg", "samples"))
def forward_mc(params: Params, images_u8: jnp.ndarray, rng, cfg: DetectorConfig,
               samples: int = 5, dropout_rate: float = 0.5):
    """MC-dropout inference (ref: predictor_utils.py:515-602
    MonteCarloPredictor + enable_dropout): `samples` stochastic passes of the
    box head over shared proposals; returns per-proposal mean probs and
    predictive std (epistemic uncertainty)."""
    if cfg.family == "query":
        raise ValueError("forward_mc supports the rcnn family only (the "
                         "reference's MC-dropout wraps its Mask R-CNN "
                         "predictor, not Mask2Former)")
    images = images_u8.astype(jnp.float32) / 255.0
    fpn = backbone_fpn(params, images, cfg)
    obj, deltas = _rpn_head(params, fpn)
    anchors = all_anchors(cfg.image_size, cfg.fpn_strides)
    props, pvalid = jax.vmap(lambda o, d: _propose(o, d, anchors, cfg))(
        obj, deltas)

    def one(rng_i):
        rngs = jax.random.split(rng_i, images.shape[0])
        _, cls_logits, _ = jax.vmap(
            lambda p2, pr, r: _box_head(params, p2, pr, cfg, r, dropout_rate)
        )(fpn[0], props, rngs)
        return jax.nn.softmax(cls_logits.astype(jnp.float32), axis=-1)

    probs = jax.vmap(one)(jax.random.split(rng, samples))  # [S, B, P, C+1]
    return props, pvalid, probs.mean(0), probs.std(0)


# ---------------------------------------------------------------------------
# training losses
# ---------------------------------------------------------------------------


def _smooth_l1(x: jnp.ndarray, beta: float = 1.0 / 9.0) -> jnp.ndarray:
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


def _focal(probs: jnp.ndarray, targets_onehot: jnp.ndarray,
           gamma: float = 2.0, alpha: float = 0.25) -> jnp.ndarray:
    """Multi-class focal loss on probabilities (kornia focal_loss semantics;
    the reference multiplies it by 10, ref: roi_head_wrappers.py:311-364)."""
    p = jnp.clip(probs, 1e-8, 1.0)
    w = alpha * jnp.power(1.0 - p, gamma)
    return -jnp.sum(targets_onehot * w * jnp.log(p), axis=-1)


def detector_loss(params: Params, images_u8: jnp.ndarray, gt: Detections,
                  cfg: DetectorConfig, head: str = "ce",
                  soft_temperature: float = 2.0, soft_alpha: float = 0.5,
                  dropout_rng=None, dropout_rate: float = 0.0,
                  ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Joint RPN + ROI-head loss on a batch with padded GT.

    `head` selects the ROI classification loss family (see module docstring).
    Soft heads read GT `logits` (teacher soft targets) instead of hard
    classes (ref: roi_head_wrappers.py:184-364). Returns (total, aux dict).
    """
    if cfg.family == "query":
        from .query_detector import query_detector_loss

        return query_detector_loss(params, images_u8, gt, cfg, head=head)
    images = images_u8.astype(jnp.float32) / 255.0
    inter = _intermediates(params, images, cfg, dropout_rng, dropout_rate,
                           gt_boxes=gt.boxes, gt_valid=gt.valid)
    anchors = all_anchors(cfg.image_size, cfg.fpn_strides)
    b = images.shape[0]
    with_masks = gt.masks is not None

    def per_image(obj, deltas, props, pvalid, feats, cls_logits, box_deltas,
                  gt_boxes, gt_classes, gt_valid, gt_soft, p2, gt_masks):
        # ---- RPN ----
        iou = pairwise_iou(anchors, gt_boxes)          # [A, G]
        iou = iou * gt_valid[None, :]
        best_iou = jnp.max(iou, axis=1)
        best_gt = jnp.argmax(iou, axis=1)
        pos = best_iou > 0.7
        # each gt's best anchor is positive too; .max is monotonic, so
        # duplicate best_anchor indices (two GTs sharing an anchor) are
        # deterministic (True wins) unlike mixed .set scatters
        best_anchor = jnp.argmax(iou, axis=0)          # [G]
        pos = pos.at[best_anchor].max(gt_valid)
        # negatives must exclude forced positives: a low-IoU anchor that is
        # some GT's best match would otherwise enter both BCE normalizers
        neg = (best_iou < 0.3) & ~pos
        obj_t = pos.astype(jnp.float32)
        bce = (jnp.maximum(obj, 0) - obj * obj_t
               + jnp.log1p(jnp.exp(-jnp.abs(obj))))
        # balanced normalization: a handful of positives must not drown in
        # thousands of negatives (the role of RPN's 256-anchor sampler)
        pos_w = pos.astype(jnp.float32)
        neg_w = neg.astype(jnp.float32)
        obj_loss = 0.5 * (
            jnp.sum(bce * pos_w) / jnp.maximum(jnp.sum(pos_w), 1.0)
            + jnp.sum(bce * neg_w) / jnp.maximum(jnp.sum(neg_w), 1.0))
        tgt_deltas = encode_boxes(anchors, gt_boxes[best_gt])
        box_w = pos.astype(jnp.float32)[:, None]
        rpn_box_loss = jnp.sum(_smooth_l1(deltas - tgt_deltas) * box_w) / \
            jnp.maximum(jnp.sum(box_w) * 4, 1.0)

        # ---- ROI head ----
        riou = pairwise_iou(props, gt_boxes) * gt_valid[None, :]
        r_best = jnp.max(riou, axis=1)
        r_gt = jnp.argmax(riou, axis=1)
        fg = (r_best > 0.5) & pvalid
        bg = (r_best <= 0.5) & pvalid
        cls_t = jnp.where(fg, gt_classes[r_gt], cfg.num_classes)  # bg class
        logp = jax.nn.log_softmax(cls_logits.astype(jnp.float32), axis=-1)
        probs = jnp.exp(logp)
        onehot = jax.nn.one_hot(cls_t, cfg.num_classes + 1)
        w = (fg | bg).astype(jnp.float32)
        if head == "ce":
            cls_loss_v = -jnp.take_along_axis(logp, cls_t[:, None],
                                              axis=-1)[:, 0]
        elif head == "focal":
            cls_loss_v = 10.0 * _focal(probs, onehot)
        elif head in ("soft", "softfocal", "msefocal"):
            # teacher soft targets over foreground classes + bg slot.
            # gt_soft carries PROBABILITIES (forward stores softmaxed
            # per-class probs in Detections.logits; SoftConsensusLabeler
            # outputs probs too) — temperature-soften in LOG space so T=1
            # reproduces the teacher distribution exactly. Softmaxing the
            # probs directly would flatten a confident teacher to near-
            # uniform (the reference's SoftHeadWrapper softmaxes raw,
            # unbounded logits — log(p) recovers them up to a constant).
            soft = jnp.concatenate(
                [jnp.log(jnp.maximum(gt_soft[r_gt], 1e-8)),
                 jnp.full((r_gt.shape[0], 1), jnp.log(1e-8))], axis=-1)
            soft = jax.nn.softmax(soft / soft_temperature, axis=-1)
            soft = jnp.where(fg[:, None], soft, onehot)
            if head == "soft":
                distill = -jnp.sum(soft * logp, axis=-1)
                hard = -jnp.take_along_axis(logp, cls_t[:, None],
                                            axis=-1)[:, 0]
                cls_loss_v = soft_alpha * distill + (1 - soft_alpha) * hard
            elif head == "softfocal":
                cls_loss_v = 10.0 * _focal(probs, soft)
            else:  # msefocal
                cls_loss_v = (jnp.sum(jnp.square(probs - soft), axis=-1)
                              + 10.0 * _focal(probs, onehot))
        else:
            raise ValueError(f"unknown head {head!r}")
        # balanced fg/bg normalization (mirrors detectron2's 1:3 sampler)
        fg_w = fg.astype(jnp.float32)
        bg_w2 = bg.astype(jnp.float32)
        cls_loss = (
            0.5 * jnp.sum(cls_loss_v * fg_w) / jnp.maximum(jnp.sum(fg_w), 1.0)
            + 0.5 * jnp.sum(cls_loss_v * bg_w2)
            / jnp.maximum(jnp.sum(bg_w2), 1.0))

        tgt_roi_deltas = encode_boxes(props, gt_boxes[r_gt],
                                      weights=ROI_BOX_WEIGHTS)
        fg_w = fg.astype(jnp.float32)[:, None]
        roi_box_loss = jnp.sum(_smooth_l1(box_deltas - tgt_roi_deltas) * fg_w
                               ) / jnp.maximum(jnp.sum(fg_w) * 4, 1.0)

        # ---- mask head (ref: utils/detectron_utils.py:202
        # weighted_mask_rcnn_loss): per-fg-proposal BCE between the matched
        # class's mask logits and the GT full-frame mask ROI-aligned into
        # the proposal box at mask resolution ----
        if with_masks:
            mlogits = _mask_head(params, p2, props, cls_t, cfg)  # [P, m, m]
            # GT masks as channels: one separable-matmul roi_align resamples
            # every GT mask into every proposal box; then pick the match
            # GT masks may live at sensor resolution (e.g. 256^2) while boxes
            # are in detector pixels — rescale via the static mask shape
            mask_scale = gt_masks.shape[-1] / cfg.image_size
            aligned = roi_align(
                jnp.transpose(gt_masks, (1, 2, 0)).astype(jnp.float32),
                props, cfg.mask_size, spatial_scale=mask_scale)  # [P,m,m,G]
            tgt = jnp.take_along_axis(
                aligned, r_gt[:, None, None, None], axis=-1)[..., 0]
            tgt = (tgt >= 0.5).astype(jnp.float32)
            mbce = (jnp.maximum(mlogits, 0) - mlogits * tgt
                    + jnp.log1p(jnp.exp(-jnp.abs(mlogits))))
            mw = fg.astype(jnp.float32)[:, None, None]
            mask_loss = jnp.sum(mbce * mw) / jnp.maximum(
                jnp.sum(mw) * cfg.mask_size * cfg.mask_size, 1.0)
        else:
            mask_loss = jnp.zeros(())
        return obj_loss, rpn_box_loss, cls_loss, roi_box_loss, mask_loss

    gt_soft = gt.logits if gt.logits is not None else jnp.zeros(
        (b, gt.capacity, cfg.num_classes))
    gt_masks = gt.masks if with_masks else jnp.zeros(
        (b, gt.boxes.shape[1], 1, 1))
    losses = jax.vmap(per_image)(
        inter.rpn_obj, inter.rpn_deltas, inter.proposals,
        inter.proposal_valid, inter.roi_features, inter.class_logits,
        inter.box_deltas, gt.boxes, gt.classes, gt.valid, gt_soft,
        inter.fpn[0], gt_masks)
    obj_l, rpnb_l, cls_l, roib_l, mask_l = [jnp.mean(l) for l in losses]
    total = obj_l + rpnb_l + cls_l + roib_l + mask_l
    aux = {"rpn_obj": obj_l, "rpn_box": rpnb_l, "roi_cls": cls_l,
           "roi_box": roib_l, "mask": mask_l}
    return total, aux
