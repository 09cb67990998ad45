#!/bin/bash
# Captioner generalization rungs (VERDICT r3 weak #4 / next #8): the
# detector protocol's discipline applied to the captioner — a FIXED,
# checksummed unseen-scene crop corpus (scene seeds 1000.., private draw,
# cached npz, eval_sha printed) evaluated across >= 3 training seeds at
# base scale plus one large (ViT-L) arm. Reports held-out class-word
# accuracy, SBERT cosine and BLEU per seed; docs/BENCH.md aggregates.
#   bash scripts/rungs_captioner.sh [outfile] [steps] [seeds..]
set -u
OUT="$(realpath -m "${1:-/tmp/rungs_captioner.log}")"
STEPS="${2:-600}"
shift 2 2>/dev/null || shift $#
SEEDS=("${@:-0 1 2}")
[ $# -eq 0 ] && SEEDS=(0 1 2)
cd "$(dirname "$0")/.."
CACHE="/tmp/cap_eval_corpus_base.npz"

echo "rungs_captioner start $(date -u) steps=$STEPS seeds=${SEEDS[*]}" >> "$OUT"
for SEED in "${SEEDS[@]}"; do
  echo "=== captioner base seed=$SEED $(date -u +%H:%M:%S) ===" >> "$OUT"
  timeout 3000 python scripts/selfcheck_training.py \
    --preset base --steps "$STEPS" --train-crops 320 --test-crops 64 \
    --eval-scenes 6 --eval-cache "$CACHE" --seed "$SEED" \
    >> "$OUT" 2>&1
  echo "--- rc=$? $(date -u +%H:%M:%S)" >> "$OUT"
done
echo "=== captioner large seed=0 $(date -u +%H:%M:%S) ===" >> "$OUT"
timeout 4000 python scripts/selfcheck_training.py \
  --preset large --steps 400 --batch 4 --train-crops 320 --test-crops 48 \
  --eval-scenes 6 --eval-cache /tmp/cap_eval_corpus_large.npz --seed 0 \
  captioner.remat=true >> "$OUT" 2>&1
echo "--- rc=$? $(date -u +%H:%M:%S)" >> "$OUT"
echo "rungs_captioner done $(date -u)" >> "$OUT"
