#!/bin/bash
# Round-3 continuation: generalization recipe ladder on the device-train
# path (all arms seed 0, FIXED 8-scene x 12-frame eval corpus — eval_sha
# printed per arm; compare arms to the 0.4354 baseline of
# 256sc/12k/b16/w48 and the 0.409 seed-0 of the old host-aug recipe).
set -u
OUT="$(realpath -m "${1:-/tmp/ladder_gen2.log}")"
cd "$(dirname "$0")/.."
CACHE=/tmp/det_eval_corpus_128px.npz
COMMON="--split scenes --batch 16 --device-train --augment --augment-crop
  --lr-schedule cosine --seed 0 --eval-cache $CACHE --ema 0.999"

# argparse: flags first, ALL positional overrides last
run() {
  local name="$1" episodes="$2" steps="$3" width="$4"
  echo "=== $name $(date -u +%H:%M:%S) ===" >> "$OUT"
  timeout 4200 python scripts/selfcheck_detector.py $COMMON \
    --episodes "$episodes" --steps "$steps" \
    detector.image_size=128 "detector.backbone_width=$width" \
    >> "$OUT" 2>&1
  echo "--- rc=$? $(date -u +%H:%M:%S)" >> "$OUT"
}

echo "ladder_gen2 start $(date -u)" >> "$OUT"
run "B: 256sc 24k w48" 256 24000 48
run "C: 256sc 24k w64" 256 24000 64
run "D: 512sc 24k w64" 512 24000 64
echo "ladder_gen2 done $(date -u)" >> "$OUT"
