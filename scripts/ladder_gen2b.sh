#!/bin/bash
# gen-ladder phase 2 (fixed eval-leak: training seeds now skip the eval
# block, so >500-scene pools stay disjoint from the fixed corpus).
# Arms: E = 256sc/48k (steps axis), F = 512sc/24k de-leaked (scene axis),
# then 2 more seeds of the interim winner are launched separately.
set -u
OUT="$(realpath -m "${1:-/tmp/ladder_gen2b.log}")"
cd "$(dirname "$0")/.."
CACHE=/tmp/det_eval_corpus_128px.npz
COMMON="--split scenes --batch 16 --device-train --augment --augment-crop
  --lr-schedule cosine --eval-cache $CACHE --ema 0.999"

run() {
  local name="$1" episodes="$2" steps="$3" width="$4" seed="$5"
  echo "=== $name $(date -u +%H:%M:%S) ===" >> "$OUT"
  timeout 4200 python scripts/selfcheck_detector.py $COMMON \
    --episodes "$episodes" --steps "$steps" --seed "$seed" \
    detector.image_size=128 "detector.backbone_width=$width" \
    >> "$OUT" 2>&1
  echo "--- rc=$? $(date -u +%H:%M:%S)" >> "$OUT"
}

echo "ladder_gen2b start $(date -u)" >> "$OUT"
run "E: 256sc 48k w48 s0" 256 48000 48 0
run "F: 512sc 24k w48 s0 (de-leaked)" 512 24000 48 0
echo "ladder_gen2b done $(date -u)" >> "$OUT"
