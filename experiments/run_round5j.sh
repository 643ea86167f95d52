#!/bin/bash
# Round-5 chain J: resident fleet via AOT blob — save the donated-state
# executable, then a FRESH process serves the full resident soak from
# it (measures the resident cold-start economics).
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
    echo "r5j: probe $i unhealthy $(date)" >> "$LOG"
    sleep 120
  done
  return 1
}

run_step() {
  name=$1; tmo=$2; shift 2
  now=$(date +%s)
  if [ "$DEADLINE" -gt 0 ] && [ $((now + tmo)) -ge "$DEADLINE" ]; then
    echo "r5j: SKIP $name (would cross deadline) $(date)" >> "$LOG"
    return 99
  fi
  if ! probe_retry; then
    echo "r5j: SKIP $name (tunnel never healthy) $(date)" >> "$LOG"
    return 98
  fi
  echo "=== r5j step $name $(date) ===" >> "$LOG"
  timeout "$tmo" "$@" >> "$OUT" 2>> "$LOG"
  rc=$?
  echo "r5j: $name rc=$rc $(date)" >> "$LOG"
  sleep 20
  return $rc
}

for i in $(seq 1 240); do
  if grep -q "DONE_ROUND5I_CHAIN" "$LOG" 2>/dev/null; then break; fi
  sleep 30
done
grep -q "DONE_ROUND5I_CHAIN" "$LOG" || {
  echo "r5j: chain B never finished, exiting $(date)" >> "$LOG"; exit 1; }

if run_step resident_save 2400 env SS_MODE=resident_save \
    python experiments/serve_soak_tpu.py; then
  run_step resident_soak_blob 1800 env SS_MODE=resident \
    python experiments/serve_soak_tpu.py || true
fi

echo DONE_ROUND5J_CHAIN >> "$LOG"
