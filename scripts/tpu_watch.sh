#!/bin/bash
# Poll the axon tunnel; the moment the chip answers, run the round-3
# validation ladder (scripts/tpu_ladder.sh). Designed to run for hours in
# the background while the tunnel is down.
#
#   bash scripts/tpu_watch.sh [ladder_outfile]
set -u
OUT="$(realpath -m "${1:-/tmp/tpu_ladder.log}")"
cd "$(dirname "$0")/.."

for i in $(seq 1 200); do
  if timeout 300 python -c "import jax; d=jax.devices(); assert d" \
      >/dev/null 2>&1; then
    echo "tunnel up, probe $i, $(date -u)" >> "$OUT"
    bash scripts/tpu_ladder.sh "$OUT"
    exit 0
  fi
  echo "probe $i down $(date -u)" >> "$OUT"
  sleep 240
done
echo "gave up $(date -u)" >> "$OUT"
exit 1
