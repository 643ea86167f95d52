#!/bin/bash
# Round-5 chain A4: after A3 showed the B=1024 iteration-chunked run
# STILL crashes the worker (the fault accumulates across executions in
# one process at B>=512), probe the remaining mitigation dimensions:
#   1. BATCH-chunking: B=1024 as 4 sequential monolithic B=256 40-iter
#      solves in ONE process — does executing several proven-safe shapes
#      back-to-back accumulate to the crash?
#   2. iteration ceiling at the safe B: B=256, 80 iters, iter-chunked
#      (monolithic 80 crashed — does chunking raise the per-B ceiling?)
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
    echo "r5a4: probe $i unhealthy $(date)" >> "$LOG"
    sleep 120
  done
  return 1
}

run_step() {
  name=$1; tmo=$2; b=$3; iters=$4; qp=$5; chunk=$6; bsplit=${7:-0}
  now=$(date +%s)
  if [ "$DEADLINE" -gt 0 ] && [ "$now" -ge "$DEADLINE" ]; then
    echo "r5a4: SKIP $name (past deadline) $(date)" >> "$LOG"; return 99
  fi
  if ! probe_retry; then
    echo "r5a4: SKIP $name (tunnel never healthy) $(date)" >> "$LOG"
    return 98
  fi
  echo "=== r5a4 step $name B=$b iters=$iters qp=$qp chunk=$chunk $(date) ===" >> "$LOG"
  timeout "$tmo" env MB_B="$b" MB_ITERS="$iters" MB_QP="$qp" MB_CHUNK="$chunk" MB_BSPLIT="$bsplit" \
    python experiments/m12_bisect.py >> "$OUT" 2>> "$LOG"
  rc=$?
  echo "r5a4: $name rc=$rc $(date)" >> "$LOG"
  echo "{\"mode\": \"m12_bisect_rc\", \"B\": $b, \"iters\": $iters, \"qp\": \"$qp\", \"chunk\": \"$chunk\", \"bsplit\": $bsplit, \"rc\": $rc}" >> "$OUT"
  sleep 20
  return $rc
}

# 1) batch-chunked: 4 x (B=256, 40 iters, monolithic) in one process
run_step bsplit_1024_40 3600 1024 40 pn_fixed none 256 || true
# 2) iteration ceiling at the safe B: 80 iters, iter-chunked
run_step chunked_256_80 3600 256 80 pn_fixed auto || true

echo DONE_ROUND5A4_CHAIN >> "$LOG"
