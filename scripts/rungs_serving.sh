#!/bin/bash
# Round-4 serving-artifact rungs: train the SERVING-config detector
# (bottleneck (3,4,6,3) R50-class backbone, FPN P3-P6 + stride-64 anchors,
# the large preset's structure at a trainable input size) on 1280^2-rendered
# frames (the serving sensor resolution, resized on device exactly like the
# fused perception program's preprocess), then evaluate the SAME weights
# under the serving inference knobs (1024 pre-NMS / 128 ROIs /
# approx_max_k), calibrate GN -> frozen affine, and save the artifact for
# bench.py (BENCH_DETECTOR_WEIGHTS) — one artifact carrying BOTH the
# unseen-scene mAP@50 and the fps number (VERDICT r3 missing #1 / weak #1).
#   bash scripts/rungs_serving.sh [outfile] [episodes] [steps] [img] [seeds..]
set -u
OUT="$(realpath -m "${1:-/tmp/rungs_serving.log}")"
EPISODES="${2:-384}"
STEPS="${3:-16000}"
IMG="${4:-256}"
shift 4 2>/dev/null || shift $#
SEEDS=("${@:-0 1 2}")
[ $# -eq 0 ] && SEEDS=(0 1 2)
cd "$(dirname "$0")/.."
CACHE="/tmp/det_eval_serving_${IMG}px.npz"

echo "rungs_serving start $(date -u) ep=$EPISODES steps=$STEPS img=$IMG seeds=${SEEDS[*]}" >> "$OUT"
for SEED in "${SEEDS[@]}"; do
  echo "=== serving seed=$SEED $(date -u +%H:%M:%S) ===" >> "$OUT"
  timeout 10000 python scripts/selfcheck_detector.py \
    --split scenes --batch 16 --device-train --augment --augment-crop \
    --lr-schedule cosine --ema 0.999 --eval-cache "$CACHE" --tta \
    --eval-serving --calibrate --pack-masks \
    --train-cache "/tmp/det_train_serving_${IMG}px_${EPISODES}sc.npz" \
    --save "/tmp/det_serving_${IMG}px_s${SEED}.pkl" \
    --episodes "$EPISODES" --steps "$STEPS" --seed "$SEED" \
    sensors.height=1280 sensors.width=1280 \
    "detector.image_size=$IMG" detector.block=bottleneck \
    "detector.backbone_depths=[3,4,6,3]" detector.backbone_width=64 \
    detector.fpn_dim=256 detector.min_level=1 detector.add_p6=true \
    >> "$OUT" 2>&1
  echo "--- rc=$? $(date -u +%H:%M:%S)" >> "$OUT"
done
echo "rungs_serving done $(date -u)" >> "$OUT"
