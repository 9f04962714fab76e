#!/bin/bash
# Mini-watcher: wait for a healthy axon window, then run the mixed-MD
# TPU smoke once. Runs alongside the main tpu_watcher (which was
# already mid-flight when this step was written; bash cannot safely
# re-read a running script, hence the separate loop).
set -u
cd "$(dirname "$0")/.."
OUT=PERF_CAPTURE
DEADLINE=${1:-21600}
T0=$(date +%s)
while :; do
  NOW=$(date +%s); [ $((NOW - T0)) -ge "$DEADLINE" ] && exit 0
  [ -f "$OUT/mixed_smoke.ok" ] && exit 0
  if timeout -k 15 280 python -c "
import jax, jax.numpy as jnp
x = jnp.full((8,8,8,8,3,3), 1+1j, dtype=jnp.complex64)
print('healthy', float(jnp.real(jnp.vdot(x, x))))
" 2>/dev/null | grep -q healthy; then
    echo "$(date '+%H:%M:%S') probe OK, running mixed smoke" >> "$OUT/mixed_smoke.log"
    if timeout -k 30 900 python scripts/tpu_mixed_smoke.py >> "$OUT/mixed_smoke.out" 2>&1; then
      touch "$OUT/mixed_smoke.ok"
      echo "$(date '+%H:%M:%S') mixed smoke OK" >> "$OUT/mixed_smoke.log"
      exit 0
    fi
    echo "$(date '+%H:%M:%S') mixed smoke FAILED" >> "$OUT/mixed_smoke.log"
  fi
  sleep 300
done
