#!/bin/bash
# Round-5 chain K: resident+mesh bit-exactness on the 1-device TPU mesh
# (unsharded baseline via the no-compile blob, then the sharded
# donated-state program).
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
    echo "r5k: probe $i unhealthy $(date)" >> "$LOG"
    sleep 120
  done
  return 1
}

run_step() {
  name=$1; tmo=$2; shift 2
  now=$(date +%s)
  if [ "$DEADLINE" -gt 0 ] && [ $((now + tmo)) -ge "$DEADLINE" ]; then
    echo "r5k: SKIP $name (would cross deadline) $(date)" >> "$LOG"
    return 99
  fi
  if ! probe_retry; then
    echo "r5k: SKIP $name (tunnel never healthy) $(date)" >> "$LOG"
    return 98
  fi
  echo "=== r5k step $name $(date) ===" >> "$LOG"
  timeout "$tmo" "$@" >> "$OUT" 2>> "$LOG"
  rc=$?
  echo "r5k: $name rc=$rc $(date)" >> "$LOG"
  sleep 20
  return $rc
}

for i in $(seq 1 240); do
  if grep -q "DONE_ROUND5J_CHAIN" "$LOG" 2>/dev/null; then break; fi
  sleep 30
done
grep -q "DONE_ROUND5J_CHAIN" "$LOG" || {
  echo "r5k: chain B never finished, exiting $(date)" >> "$LOG"; exit 1; }

if run_step resident_mesh_base 1200 env RM_MODE=base \
    python experiments/resident_mesh_tpu.py; then
  run_step resident_mesh_mesh 2400 env RM_MODE=mesh \
    python experiments/resident_mesh_tpu.py || true
fi

echo DONE_ROUND5K_CHAIN >> "$LOG"
