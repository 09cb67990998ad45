#!/bin/bash
# Round-3 TPU validation ladder: run every queued A/B once the axon tunnel
# is back. Each step appends to $OUT (default /tmp/tpu_ladder.log); steps
# are independent so a crash in one doesn't block the rest.
#
#   bash scripts/tpu_ladder.sh [outfile]
#
# Order: cheapest/highest-information first.
set -u
OUT="$(realpath -m "${1:-/tmp/tpu_ladder.log}")"
cd "$(dirname "$0")/.."

run() {
  echo "=== $* ===" >> "$OUT"
  timeout 3000 "$@" >> "$OUT" 2>&1
  echo "--- rc=$? $(date -u +%H:%M:%S)" >> "$OUT"
}

echo "ladder start $(date -u)" >> "$OUT"

# 0. is the chip back at all
run python -c "import embodied_captioning_tpu, jax; print(jax.devices())"

# 1. headline bench (head-major + approx-topk + float det input landed)
run python bench.py

# 2. decode cross-V layout probe -> decides ECAP_CROSS_V_HEADMAJOR default
run python scripts/probe_crossv.py

# 3. backbone attribution + affine-fold + s2d-stem arms
run env BENCH_PRESET=large python scripts/probe_backbone.py --batch 8

# 4. ROIAlign contraction order
run python scripts/probe_roialign.py

# 5. approx top-k quality validation at serving scale
run python scripts/probe_topk_recall.py

# 6. bench with the candidate flags (decode kernels + head-major cross V)
run env ECAP_USE_PALLAS=1 ECAP_CROSS_V_HEADMAJOR=1 python bench.py

# 7. bench with cross-V head-major only (XLA path)
run env ECAP_CROSS_V_HEADMAJOR=1 python bench.py

# 7b. decode kernels WITHOUT the cross kernel (self-block+mlp only)
run env ECAP_USE_PALLAS=1 python bench.py

# 8. worst case (all slots) after the early-exit/kernel work
run env BENCH_CAPTION_SLOTS=0 BENCH_BATCH=8 python bench.py

# 9. loop mode (sim in the loop)
run env BENCH_MODE=loop python bench.py

echo "ladder done $(date -u)" >> "$OUT"
