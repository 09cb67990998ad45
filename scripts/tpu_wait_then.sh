#!/bin/bash
# Wait until the axon TPU tunnel answers a tiny timed probe, then exec the
# given command. Usage: tpu_wait_then.sh <logfile> <cmd...>
# The probe runs in a TIMED SUBPROCESS (a hung backend init cannot be
# recovered in-process — bench.py learned this the hard way).
LOG="$1"; shift
cd "$(dirname "$0")/.."
for i in $(seq 1 120); do
  if timeout 90 python -c "
import embodied_captioning_tpu, jax
assert jax.devices()[0].platform != 'cpu'
import jax.numpy as jnp
assert float((jnp.ones((8,8)) @ jnp.ones((8,8))).sum()) == 512.0
" >/dev/null 2>&1; then
    echo "[tpu_wait] healthy after $i probes $(date -u +%H:%M:%S)" >> "$LOG"
    exec "$@"
  fi
  echo "[tpu_wait] probe $i failed $(date -u +%H:%M:%S)" >> "$LOG"
  sleep 45
done
echo "[tpu_wait] gave up" >> "$LOG"
exit 1
