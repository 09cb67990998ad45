#!/bin/bash
# Final round-3 protocol rungs: N seeds of the winning device-train recipe
# on the FIXED eval corpus (the honest generalization number = mean+-spread
# across training seeds; eval bytes identical, eval_sha printed per rung).
#   bash scripts/rungs_final.sh [outfile] [episodes] [steps] [width] [img] [seeds..]
# img = detector input size (128 default; 192 = the higher-res arm — the
# eval corpus cache is per-resolution, so each img gets its own eval_sha).
set -u
OUT="$(realpath -m "${1:-/tmp/rungs_final.log}")"
EPISODES="${2:-512}"
STEPS="${3:-24000}"
WIDTH="${4:-48}"
IMG="${5:-128}"
shift 5 2>/dev/null || shift $#
SEEDS=("${@:-1 2}")
[ $# -eq 0 ] && SEEDS=(1 2)
cd "$(dirname "$0")/.."
CACHE="/tmp/det_eval_corpus_${IMG}px.npz"

echo "rungs_final start $(date -u) ep=$EPISODES steps=$STEPS w=$WIDTH seeds=${SEEDS[*]}" >> "$OUT"
for SEED in "${SEEDS[@]}"; do
  echo "=== seed=$SEED $(date -u +%H:%M:%S) ===" >> "$OUT"
  timeout 4800 python scripts/selfcheck_detector.py \
    --split scenes --batch 16 --device-train --augment --augment-crop \
    --lr-schedule cosine --ema 0.999 --eval-cache "$CACHE" \
    --episodes "$EPISODES" --steps "$STEPS" --seed "$SEED" \
    "detector.image_size=$IMG" "detector.backbone_width=$WIDTH" \
    >> "$OUT" 2>&1
  echo "--- rc=$? $(date -u +%H:%M:%S)" >> "$OUT"
done
echo "rungs_final done $(date -u)" >> "$OUT"
