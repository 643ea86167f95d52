#!/bin/bash
# Round-5 chain H: DEVICE-RESIDENT fleet soak (compiles in-process).
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
    echo "r5h: probe $i unhealthy $(date)" >> "$LOG"
    sleep 120
  done
  return 1
}

run_step() {
  name=$1; tmo=$2; shift 2
  now=$(date +%s)
  if [ "$DEADLINE" -gt 0 ] && [ $((now + tmo)) -ge "$DEADLINE" ]; then
    echo "r5h: SKIP $name (would cross deadline) $(date)" >> "$LOG"
    return 99
  fi
  if ! probe_retry; then
    echo "r5h: SKIP $name (tunnel never healthy) $(date)" >> "$LOG"
    return 98
  fi
  echo "=== r5h step $name $(date) ===" >> "$LOG"
  timeout "$tmo" "$@" >> "$OUT" 2>> "$LOG"
  rc=$?
  echo "r5h: $name rc=$rc $(date)" >> "$LOG"
  sleep 20
  return $rc
}

for i in $(seq 1 240); do
  if grep -q "DONE_ROUND5G_CHAIN" "$LOG" 2>/dev/null; then break; fi
  sleep 30
done
grep -q "DONE_ROUND5G_CHAIN" "$LOG" || {
  echo "r5h: chain B never finished, exiting $(date)" >> "$LOG"; exit 1; }

run_step soak_resident 2700 env SS_MODE=resident python experiments/serve_soak_tpu.py || true

echo DONE_ROUND5H_CHAIN >> "$LOG"
