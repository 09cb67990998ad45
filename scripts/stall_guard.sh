#!/bin/bash
# stall_guard.sh <logfile> <stall_secs> <cmd...>
# Runs cmd appending to logfile; if the log stops growing for stall_secs,
# kills the command (exit 142). The axon tunnel's outage waves can leave a
# mid-run JAX RPC hung indefinitely; killing + relaunching (the rung
# queues' retry path, resuming from --ckpt) converts a hang into a
# bounded retry.
LOG="$1"; STALL="$2"; shift 2
touch "$LOG"
"$@" >> "$LOG" 2>&1 &
PID=$!
while kill -0 "$PID" 2>/dev/null; do
  sleep 30
  NOW=$(date +%s)
  MT=$(stat -c %Y "$LOG" 2>/dev/null || echo "$NOW")
  if [ $((NOW - MT)) -gt "$STALL" ]; then
    echo "[stall_guard] no output for ${STALL}s — killing pid $PID $(date -u +%H:%M:%S)" >> "$LOG"
    kill "$PID" 2>/dev/null; sleep 5; kill -9 "$PID" 2>/dev/null
    wait "$PID" 2>/dev/null
    exit 142
  fi
done
wait "$PID"
