#!/bin/bash
# Round-4 chain E: re-measure SolverService with the HOST-SIDE padding
# fix. The chain-C serve_fixed run showed the first fix (padding with
# eager jnp concatenate/broadcast + per-leaf a[:b] unpad slices) still
# compiled a distinct remote program per distinct lane count — ~3.4
# s/batch. serve.py now pads/unpads in numpy so exactly one program
# shape (H2D + block solve + D2H) ever reaches the device. Runs after
# chain D. REQUIRED env: CHAIN_DEADLINE (epoch).
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH}"
OUT=experiments/secondary_results.jsonl
LOG=experiments/round4_log.txt
DEADLINE=${CHAIN_DEADLINE:-0}

probe_retry() {
  for i in $(seq 1 12); do
    if timeout 150 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((256,256)); y = np.asarray(x @ x)
assert y[0,0] == 256.0
print('HEALTHY')
" 2>/dev/null | grep -q HEALTHY; then return 0; fi
    echo "r4e: probe $i unhealthy $(date)" >> "$LOG"
    sleep 120
  done
  return 1
}

run_step() {
  name=$1; tmo=$2; shift 2
  now=$(date +%s)
  if [ "$now" -ge "$DEADLINE" ]; then
    echo "r4e: SKIP $name (past deadline) $(date)" >> "$LOG"; return 1
  fi
  if ! probe_retry; then
    echo "r4e: SKIP $name (tunnel never healthy) $(date)" >> "$LOG"; return 1
  fi
  echo "=== r4e step $name $(date) ===" >> "$LOG"
  timeout "$tmo" "$@" >> "$OUT" 2>> "$LOG"
  rc=$?
  echo "r4e: $name rc=$rc $(date)" >> "$LOG"
  sleep 30
  return $rc
}

for i in $(seq 1 480); do
  if grep -q "DONE_ROUND4D_CHAIN" "$LOG" 2>/dev/null; then break; fi
  sleep 60
done
grep -q "DONE_ROUND4D_CHAIN" "$LOG" || {
  echo "r4e: chain D never finished, exiting $(date)" >> "$LOG"; exit 1; }

run_step serve_hostpad 3600 env SERVE_TAG=serve_hostpad \
  python experiments/serve_tpu.py

echo DONE_ROUND4E_CHAIN >> "$LOG"
