#!/bin/bash
# Round-4 chain F: m12_pn retry at B=64. The pure-XLA m=12 vmap program
# crashed the TPU worker at B=1024 twice (with and without per-stage
# kernels — round4_log 11:53 and 12:41) yet runs fine on CPU, so this
# distinguishes a size-dependent backend fault from an unconditional
# one. Runs after chain E. REQUIRED env: CHAIN_DEADLINE (epoch).
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
    echo "r4f: probe $i unhealthy $(date)" >> "$LOG"
    sleep 120
  done
  return 1
}

run_step() {
  name=$1; tmo=$2; shift 2
  now=$(date +%s)
  if [ "$now" -ge "$DEADLINE" ]; then
    echo "r4f: SKIP $name (past deadline) $(date)" >> "$LOG"; return 1
  fi
  if ! probe_retry; then
    echo "r4f: SKIP $name (tunnel never healthy) $(date)" >> "$LOG"; return 1
  fi
  echo "=== r4f step $name $(date) ===" >> "$LOG"
  timeout "$tmo" "$@" >> "$OUT" 2>> "$LOG"
  rc=$?
  echo "r4f: $name rc=$rc $(date)" >> "$LOG"
  sleep 30
  return $rc
}

for i in $(seq 1 480); do
  if grep -q "DONE_ROUND4E_CHAIN" "$LOG" 2>/dev/null; then break; fi
  sleep 60
done
grep -q "DONE_ROUND4E_CHAIN" "$LOG" || {
  echo "r4f: chain E never finished, exiting $(date)" >> "$LOG"; exit 1; }

run_step m12_pn_b64 2400 env SB_MODE=m12_pn SB_BATCH=64 \
  python experiments/secondary_bench.py

echo DONE_ROUND4F_CHAIN >> "$LOG"
