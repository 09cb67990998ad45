#!/bin/bash
# Round-5 medium-cost measured asks (VERDICT r4 next #4,#5,#6,#7,#8,#9),
# serialized in one queue. Each block is independently resumable — check
# the log for the last completed block and comment out to re-run.
#   bash scripts/rungs_r5_small.sh [outfile]
set -u
OUT="$(realpath -m "${1:-/tmp/r5_small.log}")"
cd "$(dirname "$0")/.."
echo "r5_small start $(date -u)" >> "$OUT"

# --- #4a multi-generation teacher-student (vanilla, 3 generations) -------
echo "=== ts-multigen $(date -u +%H:%M:%S) ===" >> "$OUT"
timeout 6000 python scripts/selfcheck_teacher_student.py \
  --teacher /tmp/det_proto_s0.pkl --modes vanilla --generations 3 \
  >> "$OUT" 2>&1
echo "--- rc=$? $(date -u +%H:%M:%S)" >> "$OUT"

# --- #4b semantic_map diagnosis: hybrid masks + fine voxels --------------
echo "=== ts-semanticmap $(date -u +%H:%M:%S) ===" >> "$OUT"
timeout 8000 python scripts/selfcheck_teacher_student.py \
  --teacher /tmp/det_proto_s0.pkl \
  --modes semantic_map,semantic_map_hybrid,semantic_map_fine \
  >> "$OUT" 2>&1
echo "--- rc=$? $(date -u +%H:%M:%S)" >> "$OUT"

# --- #5 cycle at scale + triplet regularizer -----------------------------
echo "=== cycle-scale-triplet $(date -u +%H:%M:%S) ===" >> "$OUT"
timeout 6000 python scripts/selfcheck_cycle.py --preset base \
  --seeds 0,1 --explore-envs 8 --triplet-weight 0.05 --ft-batch 24 \
  --workdir /tmp/cycle_store_r5 >> "$OUT" 2>&1
echo "--- rc=$? $(date -u +%H:%M:%S)" >> "$OUT"

# --- #6 captioner corpus scaling: 1k and 5k crops, 3 seeds at 1k ---------
echo "=== captioner-1k $(date -u +%H:%M:%S) ===" >> "$OUT"
for SEED in 0 1 2; do
  timeout 4000 python scripts/selfcheck_training.py --preset base \
    --train-scenes 64 --train-crops 1000 --steps 1500 --scan-steps 25 \
    --train-cache /tmp/cap_train_1k_base.npz \
    --eval-cache /tmp/cap_eval_corpus_base.npz --test-crops 64 \
    --eval-scenes 6 --seed "$SEED" >> "$OUT" 2>&1
  echo "--- 1k seed=$SEED rc=$? $(date -u +%H:%M:%S)" >> "$OUT"
done
echo "=== captioner-5k $(date -u +%H:%M:%S) ===" >> "$OUT"
timeout 6000 python scripts/selfcheck_training.py --preset base \
  --train-scenes 320 --train-crops 5000 --steps 3000 --scan-steps 25 \
  --train-cache /tmp/cap_train_5k_base.npz \
  --eval-cache /tmp/cap_eval_corpus_base.npz --test-crops 64 \
  --eval-scenes 6 --seed 0 >> "$OUT" 2>&1
echo "--- 5k rc=$? $(date -u +%H:%M:%S)" >> "$OUT"

# --- #9 stress + wide eval of the committed artifact ---------------------
echo "=== eval-artifact $(date -u +%H:%M:%S) ===" >> "$OUT"
timeout 4000 python scripts/eval_artifact.py >> "$OUT" 2>&1
echo "--- rc=$? $(date -u +%H:%M:%S)" >> "$OUT"

# --- #8 PPO: 10x env budget via fused windows + entropy sweep ------------
echo "=== rl-fused $(date -u +%H:%M:%S) ===" >> "$OUT"
timeout 10000 python scripts/selfcheck_rl.py --preset base --fused \
  --seeds 0,1 --ppo-updates 60 --entropy 0.001,0.01 \
  sim.episode_steps=300 >> "$OUT" 2>&1
echo "--- rc=$? $(date -u +%H:%M:%S)" >> "$OUT"

# --- #7 query family at the serving config (same corpus cache) -----------
echo "=== query-serving $(date -u +%H:%M:%S) ===" >> "$OUT"
timeout 10000 python scripts/selfcheck_detector.py \
  --split scenes --batch 16 --device-train --augment --augment-crop \
  --lr-schedule cosine --ema 0.999 \
  --eval-cache /tmp/det_eval_serving_256px.npz --tta --pack-masks \
  --train-cache /tmp/det_train_serving_256px_384sc.npz \
  --save /tmp/det_serving_query_256px_s0.pkl \
  --episodes 384 --steps 16000 --seed 0 \
  sensors.height=1280 sensors.width=1280 \
  detector.image_size=256 detector.family=query detector.query_aux_topk=3 \
  >> "$OUT" 2>&1
echo "--- rc=$? $(date -u +%H:%M:%S)" >> "$OUT"

echo "r5_small done $(date -u)" >> "$OUT"
