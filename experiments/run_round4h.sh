#!/bin/bash
# Round-4 chain H: re-measure SolverService with the single-transfer
# packed D2H (commit b156bba; chain E measured ~26 ms per D2H transfer
# x 10 Solution leaves = ~0.3 s of the 0.57 s batch). Expect per-batch
# ~0.3 s and closed-loop p50 ~0.6 s. Runs after chain G.
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
    echo "r4h: probe $i unhealthy $(date)" >> "$LOG"
    sleep 120
  done
  return 1
}

run_step() {
  name=$1; tmo=$2; shift 2
  now=$(date +%s)
  if [ "$now" -ge "$DEADLINE" ]; then
    echo "r4h: SKIP $name (past deadline) $(date)" >> "$LOG"; return 1
  fi
  if ! probe_retry; then
    echo "r4h: SKIP $name (tunnel never healthy) $(date)" >> "$LOG"; return 1
  fi
  echo "=== r4h step $name $(date) ===" >> "$LOG"
  timeout "$tmo" "$@" >> "$OUT" 2>> "$LOG"
  rc=$?
  echo "r4h: $name rc=$rc $(date)" >> "$LOG"
  sleep 30
  return $rc
}

for i in $(seq 1 480); do
  if grep -q "DONE_ROUND4G_CHAIN" "$LOG" 2>/dev/null; then break; fi
  sleep 60
done
grep -q "DONE_ROUND4G_CHAIN" "$LOG" || {
  echo "r4h: chain G never finished, exiting $(date)" >> "$LOG"; exit 1; }

run_step serve_packed 3600 env SERVE_TAG=serve_packed \
  python experiments/serve_tpu.py
run_step serve_packed_open 3600 env SERVE_TAG=serve_packed_open SERVE_OPEN=1 \
  python experiments/serve_tpu.py

echo DONE_ROUND4H_CHAIN >> "$LOG"
