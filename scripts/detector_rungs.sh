#!/bin/bash
# Repeat-seed detector generalization rungs on a FIXED unseen-scene eval
# corpus (round-3 follow-up to the ladder spread in docs/BENCH.md): three
# training seeds of the 128-scene rung, all evaluated on the same cached
# 8-scene x 12-frame corpus (checksum printed per rung), so the reported
# number is mean±spread of *training* variance, not eval-draw variance.
#
#   bash scripts/detector_rungs.sh [outfile] [steps] [seeds...]
set -u
OUT="$(realpath -m "${1:-/tmp/det_rungs.log}")"
STEPS="${2:-8000}"
shift 2 2>/dev/null || true
SEEDS=("${@:-0}")
if [ "${#SEEDS[@]}" -eq 1 ] && [ "${SEEDS[0]}" = "0" ] && [ $# -eq 0 ]; then
  SEEDS=(0 1 2)
fi
cd "$(dirname "$0")/.."
CACHE=/tmp/det_eval_corpus_128px.npz

echo "rungs start $(date -u) steps=$STEPS seeds=${SEEDS[*]}" >> "$OUT"
for SEED in "${SEEDS[@]}"; do
  echo "=== rung seed=$SEED $(date -u +%H:%M:%S) ===" >> "$OUT"
  timeout 5400 python scripts/selfcheck_detector.py \
    --split scenes --episodes 128 --steps "$STEPS" --augment \
    --seed "$SEED" --eval-cache "$CACHE" \
    detector.image_size=128 detector.backbone_width=48 \
    >> "$OUT" 2>&1
  echo "--- rc=$? $(date -u +%H:%M:%S)" >> "$OUT"
done
echo "rungs done $(date -u)" >> "$OUT"
