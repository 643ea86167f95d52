#!/bin/bash
# Round-5 chain I: m16 equivalence on a CONVERGING workload (both
# paths reach the same optimum via a NEAR goal + small x0 — the
# capped-lanes compounding noise is excluded).
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH}"
OUT=experiments/secondary_results.jsonl
LOG=experiments/round5_log.txt
DEADLINE=${CHAIN_DEADLINE:-0}

probe_retry() {
  for i in $(seq 1 12); do
    if timeout 150 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((256,256)); y = np.asarray(x @ x)
assert y[0,0] == 256.0
print('HEALTHY')
" 2>/dev/null | grep -q HEALTHY; then return 0; fi
    echo "r5i: probe $i unhealthy $(date)" >> "$LOG"
    sleep 120
  done
  return 1
}

run_step() {
  name=$1; tmo=$2; shift 2
  now=$(date +%s)
  if [ "$DEADLINE" -gt 0 ] && [ $((now + tmo)) -ge "$DEADLINE" ]; then
    echo "r5i: SKIP $name (would cross deadline) $(date)" >> "$LOG"
    return 99
  fi
  if ! probe_retry; then
    echo "r5i: SKIP $name (tunnel never healthy) $(date)" >> "$LOG"
    return 98
  fi
  echo "=== r5i step $name $(date) ===" >> "$LOG"
  timeout "$tmo" "$@" >> "$OUT" 2>> "$LOG"
  rc=$?
  echo "r5i: $name rc=$rc $(date)" >> "$LOG"
  sleep 20
  return $rc
}

for i in $(seq 1 240); do
  if grep -q "DONE_ROUND5H_CHAIN" "$LOG" 2>/dev/null; then break; fi
  sleep 30
done
grep -q "DONE_ROUND5H_CHAIN" "$LOG" || {
  echo "r5i: chain B never finished, exiting $(date)" >> "$LOG"; exit 1; }

run_step m16_equiv_conv 3300 env M16_MODE=equiv M16_QP=pn_fixed M16_SCALE=0.05 M16_EASY=1 python experiments/m16_probe.py || true

echo DONE_ROUND5I_CHAIN >> "$LOG"
