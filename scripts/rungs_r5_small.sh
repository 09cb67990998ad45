#!/bin/bash
# Round-5 medium-cost measured asks (VERDICT r4 next #4,#5,#6,#7,#8,#9),
# serialized in one queue. Every block runs under stall_guard (the tunnel's
# outage waves can hang a JAX RPC forever) with up to 3 relaunches.
#   bash scripts/rungs_r5_small.sh [outfile]
set -u
OUT="$(realpath -m "${1:-/tmp/r5_small.log}")"
cd "$(dirname "$0")/.."
echo "r5_small start $(date -u)" >> "$OUT"

block() {
  # block <name> <stall_secs> <cmd...>
  local NAME="$1" STALL="$2"; shift 2
  local TRY RC
  for TRY in 1 2 3; do
    echo "=== $NAME try=$TRY $(date -u +%H:%M:%S) ===" >> "$OUT"
    bash scripts/stall_guard.sh "$OUT" "$STALL" "$@"
    RC=$?
    echo "--- $NAME rc=$RC $(date -u +%H:%M:%S)" >> "$OUT"
    [ "$RC" -eq 0 ] && return 0
    sleep 90
  done
  return 1
}

# --- #4a multi-generation teacher-student (vanilla, 3 generations) -------
block ts-multigen 1200 timeout 8000 python \
  scripts/selfcheck_teacher_student.py \
  --teacher /tmp/det_proto_s0.pkl --modes vanilla --generations 3

# --- #4b semantic_map diagnosis: hybrid masks + fine voxels --------------
block ts-semanticmap 1800 timeout 10000 python \
  scripts/selfcheck_teacher_student.py --teacher /tmp/det_proto_s0.pkl \
  --modes semantic_map,semantic_map_hybrid,semantic_map_fine

# --- #5 cycle at scale + triplet regularizer -----------------------------
block cycle-scale 1500 timeout 8000 python scripts/selfcheck_cycle.py \
  --preset base --seeds 0,1 --explore-envs 8 --triplet-weight 0.05 \
  --ft-batch 24 --workdir /tmp/cycle_store_r5

# --- #6 captioner corpus scaling: 1k (3 seeds) and 5k crops --------------
for SEED in 0 1 2; do
  block "captioner-1k-s$SEED" 900 timeout 5000 python \
    scripts/selfcheck_training.py --preset base \
    --train-scenes 64 --train-crops 1000 --steps 1500 --scan-steps 25 \
    --train-cache /tmp/cap_train_1k_base.npz \
    --eval-cache /tmp/cap_eval_corpus_base.npz --test-crops 64 \
    --eval-scenes 6 --seed "$SEED"
done
block captioner-5k 900 timeout 7000 python scripts/selfcheck_training.py \
  --preset base --train-scenes 320 --train-crops 5000 --steps 3000 \
  --scan-steps 25 --train-cache /tmp/cap_train_5k_base.npz \
  --eval-cache /tmp/cap_eval_corpus_base.npz --test-crops 64 \
  --eval-scenes 6 --seed 0

# --- #9 stress + wide eval of the committed artifact ---------------------
block eval-artifact 1500 timeout 6000 python scripts/eval_artifact.py

# --- #8 PPO: 10x env budget via fused windows + entropy sweep ------------
block rl-fused 2400 timeout 12000 python scripts/selfcheck_rl.py \
  --preset base --fused --seeds 0,1 --ppo-updates 60 \
  --entropy 0.001,0.01 sim.episode_steps=300

# --- #7 query family at the serving config (same corpus cache) -----------
block query-serving 900 timeout 12000 python \
  scripts/selfcheck_detector.py \
  --split scenes --batch 16 --device-train --augment --augment-crop \
  --lr-schedule cosine --ema 0.999 \
  --eval-cache /tmp/det_eval_serving_256px.npz --tta --pack-masks \
  --ckpt /tmp/det_ckpt_query_256px_s0.pkl \
  --train-cache /tmp/det_train_serving_256px_384sc.npz \
  --save /tmp/det_serving_query_256px_s0.pkl \
  --episodes 384 --steps 16000 --seed 0 \
  sensors.height=1280 sensors.width=1280 \
  detector.image_size=256 detector.family=query detector.query_aux_topk=3

echo "r5_small done $(date -u)" >> "$OUT"
