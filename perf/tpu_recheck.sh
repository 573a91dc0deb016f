#!/bin/bash
# One-shot: wait for the axon TPU tunnel to recover, then run the pending
# round-2 measurements (post-refactor bench + blend-chunk A/B).
# Usage: bash perf/tpu_recheck.sh [probe_interval_s]
set -u
cd "$(dirname "$0")/.."
INTERVAL="${1:-180}"
LOG=/tmp/tpu_recheck.log
echo "$(date -Is) watcher start" >> "$LOG"
while true; do
  if timeout 90 python - << 'PY' >> "$LOG" 2>&1
import jax, jax.numpy as jnp
print("probe ok", float((jnp.ones((64,64))@jnp.ones((64,64))).sum()))
PY
  then break; fi
  echo "$(date -Is) tunnel still down" >> "$LOG"
  sleep "$INTERVAL"
done
echo "$(date -Is) tunnel UP - bench chunk=128" >> "$LOG"
timeout 2400 python bench.py >> "$LOG" 2>&1
echo "$(date -Is) bench chunk=256" >> "$LOG"
VEGS_BLEND_CHUNK=256 timeout 2400 python bench.py >> "$LOG" 2>&1
echo "$(date -Is) done" >> "$LOG"
