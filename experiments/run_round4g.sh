#!/bin/bash
# Round-4 chain G: the AOT serving cold-start measurement through the
# PACKAGE APIs (ilqr_tpu.aot + SolverService(aot=...)): save phase pays
# the compile once and stamps per-lane costs; serve phase is a FRESH
# process that must reach its first solution in seconds, bit-equal to
# the save phase, then absorb a 64-request burst with zero compiles.
# Runs after chain F. REQUIRED env: CHAIN_DEADLINE (epoch).
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
    echo "r4g: probe $i unhealthy $(date)" >> "$LOG"
    sleep 120
  done
  return 1
}

run_step() {
  name=$1; tmo=$2; shift 2
  now=$(date +%s)
  if [ "$now" -ge "$DEADLINE" ]; then
    echo "r4g: SKIP $name (past deadline) $(date)" >> "$LOG"; return 1
  fi
  if ! probe_retry; then
    echo "r4g: SKIP $name (tunnel never healthy) $(date)" >> "$LOG"; return 1
  fi
  echo "=== r4g step $name $(date) ===" >> "$LOG"
  timeout "$tmo" "$@" >> "$OUT" 2>> "$LOG"
  rc=$?
  echo "r4g: $name rc=$rc $(date)" >> "$LOG"
  sleep 30
  return $rc
}

for i in $(seq 1 480); do
  if grep -q "DONE_ROUND4F_CHAIN" "$LOG" 2>/dev/null; then break; fi
  sleep 60
done
grep -q "DONE_ROUND4F_CHAIN" "$LOG" || {
  echo "r4g: chain F never finished, exiting $(date)" >> "$LOG"; exit 1; }

run_step serve_aot_save 2500 env SA_MODE=save \
  python experiments/serve_aot_tpu.py
run_step serve_aot_serve 1200 env SA_MODE=serve \
  python experiments/serve_aot_tpu.py

echo DONE_ROUND4G_CHAIN >> "$LOG"
