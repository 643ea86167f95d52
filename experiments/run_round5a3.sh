#!/bin/bash
# Round-5 chain A3: VALIDATE the iteration-chunked mitigation at the
# exact round-4 crash configuration — m=12 vmap path, B=1024,
# max_iter=40 — now dispatched in SAFE_ITER_CHUNK=4 chunks
# (batch.solve_batch iter_chunk='auto'). Also re-proves bit-equivalence
# on device by comparing the B=256 chunked run against chain A's
# monolithic B=256 40-iter mean_cost (29.7201).
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
    echo "r5a3: probe $i unhealthy $(date)" >> "$LOG"
    sleep 120
  done
  return 1
}

run_step() {
  name=$1; tmo=$2; b=$3; iters=$4; qp=$5; chunk=$6
  now=$(date +%s)
  if [ "$DEADLINE" -gt 0 ] && [ "$now" -ge "$DEADLINE" ]; then
    echo "r5a3: SKIP $name (past deadline) $(date)" >> "$LOG"; return 99
  fi
  if ! probe_retry; then
    echo "r5a3: SKIP $name (tunnel never healthy) $(date)" >> "$LOG"
    return 98
  fi
  echo "=== r5a3 step $name B=$b iters=$iters qp=$qp chunk=$chunk $(date) ===" >> "$LOG"
  timeout "$tmo" env MB_B="$b" MB_ITERS="$iters" MB_QP="$qp" MB_CHUNK="$chunk" \
    python experiments/m12_bisect.py >> "$OUT" 2>> "$LOG"
  rc=$?
  echo "r5a3: $name rc=$rc $(date)" >> "$LOG"
  echo "{\"mode\": \"m12_bisect_rc\", \"B\": $b, \"iters\": $iters, \"qp\": \"$qp\", \"chunk\": \"$chunk\", \"rc\": $rc}" >> "$OUT"
  sleep 20
  return $rc
}

# bit-equivalence on device at the proven-safe shape first (cheap-ish)
run_step chunked_256_40 2400 256 40 pn_fixed auto || true
# the round-4 killer config, chunked
run_step chunked_1024_40 3600 1024 40 pn_fixed auto || true

echo DONE_ROUND5A3_CHAIN >> "$LOG"
