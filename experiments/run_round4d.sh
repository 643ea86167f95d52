#!/bin/bash
# Round-4 chain D: retry m12_pn with the per-stage Pallas kernels pinned
# off (the auto-engaged m=12 rollout/derivs kernels crashed the TPU
# worker on first contact — round4_log 11:53). Runs after chain C.
# REQUIRED env: CHAIN_DEADLINE (epoch).
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
    echo "r4d: probe $i unhealthy $(date)" >> "$LOG"
    sleep 120
  done
  return 1
}

run_step() {
  name=$1; tmo=$2; shift 2
  now=$(date +%s)
  if [ "$now" -ge "$DEADLINE" ]; then
    echo "r4d: SKIP $name (past deadline) $(date)" >> "$LOG"; return 1
  fi
  if ! probe_retry; then
    echo "r4d: SKIP $name (tunnel never healthy) $(date)" >> "$LOG"; return 1
  fi
  echo "=== r4d step $name $(date) ===" >> "$LOG"
  timeout "$tmo" "$@" >> "$OUT" 2>> "$LOG"
  rc=$?
  echo "r4d: $name rc=$rc $(date)" >> "$LOG"
  sleep 30
  return $rc
}

for i in $(seq 1 480); do
  if grep -q "DONE_ROUND4C_CHAIN" "$LOG" 2>/dev/null; then break; fi
  sleep 60
done
grep -q "DONE_ROUND4C_CHAIN" "$LOG" || {
  echo "r4d: chain C never finished, exiting $(date)" >> "$LOG"; exit 1; }

run_step m12_pn_xla 3000 env SB_MODE=m12_pn python experiments/secondary_bench.py

echo DONE_ROUND4D_CHAIN >> "$LOG"
