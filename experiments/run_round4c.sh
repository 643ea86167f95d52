#!/bin/bash
# Round-4 chain C: re-measure SolverService after the fixed-shape padding
# fix (the variable-B serving pathology found by chain A), plus the AOT
# and trace steps chain A skipped on flaky post-process probes.
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
    echo "r4c: probe $i unhealthy $(date)" >> "$LOG"
    sleep 120
  done
  return 1
}

run_step() {
  name=$1; tmo=$2; shift 2
  now=$(date +%s)
  if [ "$now" -ge "$DEADLINE" ]; then
    echo "r4c: SKIP $name (past deadline) $(date)" >> "$LOG"; return 1
  fi
  if ! probe_retry; then
    echo "r4c: SKIP $name (tunnel never healthy) $(date)" >> "$LOG"; return 1
  fi
  echo "=== r4c step $name $(date) ===" >> "$LOG"
  timeout "$tmo" "$@" >> "$OUT" 2>> "$LOG"
  rc=$?
  echo "r4c: $name rc=$rc $(date)" >> "$LOG"
  sleep 30
  return $rc
}

# wait for chain B (one TPU process at a time)
for i in $(seq 1 480); do
  if grep -q "DONE_ROUND4B_CHAIN" "$LOG" 2>/dev/null; then break; fi
  sleep 60
done
grep -q "DONE_ROUND4B_CHAIN" "$LOG" || {
  echo "r4c: chain B never finished, exiting $(date)" >> "$LOG"; exit 1; }

run_step serve_fixed 3600 python experiments/serve_tpu.py
run_step aot_save 2500 env AOT_MODE=save python experiments/aot_probe.py
run_step aot_load 1200 env AOT_MODE=load python experiments/aot_probe.py
run_step trace 2500 python experiments/trace_probe.py

echo DONE_ROUND4C_CHAIN >> "$LOG"
