#!/bin/bash
# Round-3 continuation arms, serialized on the shared chip:
#   A) R50 protocol recipe with --tta  -> paired plain-vs-flip-TTA unseen
#      mAP on the SAME trained weights (training variance cancels)
#   B) query family with one-to-many aux matching (query_aux_topk=3),
#      --tta as a free paired read on the same weights
#   C) arm "768": the scaled 768-scene/36k-step recipe with --tta
#   D) arm "wide": the protocol recipe evaluated PAIRED on the 8-scene
#      protocol corpus AND a 24-scene wide corpus (seed block 100000) —
#      separates eval-draw noise from training variance
# Protocol otherwise identical to scripts/rungs_final.sh (512 de-leaked
# scenes / 24k device-train steps / w48 / 128^2 / cosine / crop-aug / EMA,
# fixed checksummed eval corpus).
#   bash scripts/rungs_tta_qaux.sh [outfile] [arm: tta|qaux|768|wide|both] [seeds..]
set -u
OUT="$(realpath -m "${1:-/tmp/rungs_tta_qaux.log}")"
ARM="${2:-both}"
shift 2 2>/dev/null || shift $#
SEEDS=("${@}")
[ ${#SEEDS[@]} -eq 0 ] && SEEDS=(0 1 2)
cd "$(dirname "$0")/.."
CACHE="/tmp/det_eval_corpus_128px.npz"

run_rung() { # $1 seed, $2 episodes, $3 steps, rest: extra overrides
  local seed="$1" eps="$2" steps="$3"; shift 3
  timeout 4800 python scripts/selfcheck_detector.py \
    --split scenes --batch 16 --device-train --augment --augment-crop \
    --lr-schedule cosine --ema 0.999 --eval-cache "$CACHE" --tta \
    --episodes "$eps" --steps "$steps" --seed "$seed" \
    detector.image_size=128 detector.backbone_width=48 "$@" \
    >> "$OUT" 2>&1
  echo "--- rc=$? $(date -u +%H:%M:%S)" >> "$OUT"
}

echo "rungs_tta_qaux start $(date -u) arm=$ARM seeds=${SEEDS[*]}" >> "$OUT"
if [ "$ARM" = tta ] || [ "$ARM" = both ]; then
  for S in "${SEEDS[@]}"; do
    echo "=== arm=tta(r50) seed=$S $(date -u +%H:%M:%S) ===" >> "$OUT"
    run_rung "$S" 512 24000
  done
fi
if [ "$ARM" = qaux ] || [ "$ARM" = both ]; then
  for S in "${SEEDS[@]}"; do
    echo "=== arm=qaux seed=$S $(date -u +%H:%M:%S) ===" >> "$OUT"
    run_rung "$S" 512 24000 detector.family=query detector.query_aux_topk=3
  done
fi
if [ "$ARM" = 768 ]; then
  for S in "${SEEDS[@]}"; do
    echo "=== arm=768sc36k+tta seed=$S $(date -u +%H:%M:%S) ===" >> "$OUT"
    run_rung "$S" 768 36000
  done
fi
if [ "$ARM" = wide ]; then
  for S in "${SEEDS[@]}"; do
    echo "=== arm=wide-eval seed=$S $(date -u +%H:%M:%S) ===" >> "$OUT"
    run_rung "$S" 512 24000 --eval-wide 24 \
      --eval-wide-cache /tmp/det_eval_corpus_wide_128px.npz
  done
fi
echo "rungs_tta_qaux done $(date -u)" >> "$OUT"
