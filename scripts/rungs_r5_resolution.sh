#!/bin/bash
# Round-5 resolution curve (VERDICT r4 next #2 + #3): the serving recipe at
# 384^2 and 512^2 detector input — mAP + fps must come from the SAME
# artifact at each size, giving the mAP-vs-input-size curve above the
# committed 256^2 point. Every rung adds --affine-finetune (next #3): a
# short affine-native fine-tune after GN->affine calibration, since larger
# inputs are exactly where GN bandwidth bites (measured 2.5x backbone at
# 1024^2).
#   bash scripts/rungs_r5_resolution.sh [outfile]
set -u
OUT="$(realpath -m "${1:-/tmp/r5_resolution.log}")"
cd "$(dirname "$0")/.."

run_rung() {
  local IMG="$1" SEED="$2" BATCH="$3" STEPS="$4"
  echo "=== r5 img=$IMG seed=$SEED batch=$BATCH $(date -u +%H:%M:%S) ===" >> "$OUT"
  bash scripts/stall_guard.sh "$OUT" 900 \
    timeout 14000 python scripts/selfcheck_detector.py \
    --split scenes --batch "$BATCH" --device-train --augment --augment-crop \
    --lr-schedule cosine --ema 0.999 \
    --eval-cache "/tmp/det_eval_serving_${IMG}px.npz" --tta \
    --eval-serving --calibrate --affine-finetune 400 --pack-masks \
    --ckpt "/tmp/det_ckpt_${IMG}px_s${SEED}_b${BATCH}.pkl" \
    --train-cache "/tmp/det_train_serving_${IMG}px_384sc.npz" \
    --save "/tmp/det_serving_${IMG}px_s${SEED}.pkl" \
    --episodes 384 --steps "$STEPS" --seed "$SEED" \
    sensors.height=1280 sensors.width=1280 \
    "detector.image_size=$IMG" detector.block=bottleneck \
    "detector.backbone_depths=[3,4,6,3]" detector.backbone_width=64 \
    detector.fpn_dim=256 detector.min_level=1 detector.add_p6=true
  local RC=$?
  echo "--- rc=$RC $(date -u +%H:%M:%S)" >> "$OUT"
  return $RC
}

retry_rung() {
  # tunnel outages come in waves; --ckpt makes retries resume, so just
  # keep relaunching (bounded) until the rung completes
  local TRIES=0
  until run_rung "$@"; do
    TRIES=$((TRIES + 1))
    if [ "$TRIES" -ge 6 ]; then
      echo "!!! rung $* failed $TRIES times, giving up" >> "$OUT"
      return 1
    fi
    if grep -q "RESOURCE_EXHAUSTED" "$OUT" && [ "$1" = 512 ]; then
      return 1  # OOM: caller handles the batch fallback
    fi
    echo "... retry $TRIES for rung $* $(date -u +%H:%M:%S)" >> "$OUT"
    sleep 90
  done
}

echo "r5_resolution start $(date -u)" >> "$OUT"
# 384^2: two seeds at the full 16k-step serving recipe
retry_rung 384 0 16 16000
retry_rung 384 1 16 16000
# 512^2: one seed (4x the 256^2 train cost); on OOM retry at batch 8 with
# proportionally more steps (same sample budget)
if ! retry_rung 512 0 16 16000; then
  if grep -q "RESOURCE_EXHAUSTED" "$OUT"; then
    echo "=== 512 OOM at batch 16 -> batch 8 / 24k steps ===" >> "$OUT"
    retry_rung 512 0 8 24000
  fi
fi
echo "r5_resolution done $(date -u)" >> "$OUT"
