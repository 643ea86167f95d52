#!/bin/bash
# Round-5 chain A2: test the WATCHDOG hypothesis from chain A's bisect.
# Chain A: (B=256, 40 iters) runs ~190 s; (B=512, 40 iters) crashes;
# (B=512/1024, 4 iters) run. Hypothesis: the TPU worker kills any single
# program execution past ~300 s ("kernel fault"), i.e. the boundary is
# EXECUTION TIME, not shape. Decisive probes:
#   (B=512, 20 iters)  — est ~190 s run: watchdog theory says RUNS
#   (B=256, 80 iters)  — est ~380 s run: watchdog theory says CRASHES
#   (B=512, 40 iters, iterative) — crashes too if time-based (QP-agnostic)
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
    echo "r5a2: probe $i unhealthy $(date)" >> "$LOG"
    sleep 120
  done
  return 1
}

run_step() {
  name=$1; tmo=$2; b=$3; iters=$4; qp=$5
  now=$(date +%s)
  if [ "$DEADLINE" -gt 0 ] && [ "$now" -ge "$DEADLINE" ]; then
    echo "r5a2: SKIP $name (past deadline) $(date)" >> "$LOG"; return 99
  fi
  if ! probe_retry; then
    echo "r5a2: SKIP $name (tunnel never healthy) $(date)" >> "$LOG"
    return 98
  fi
  echo "=== r5a2 step $name B=$b iters=$iters qp=$qp $(date) ===" >> "$LOG"
  timeout "$tmo" env MB_B="$b" MB_ITERS="$iters" MB_QP="$qp" \
    python experiments/m12_bisect.py >> "$OUT" 2>> "$LOG"
  rc=$?
  echo "r5a2: $name rc=$rc $(date)" >> "$LOG"
  echo "{\"mode\": \"m12_bisect_rc\", \"B\": $b, \"iters\": $iters, \"qp\": \"$qp\", \"rc\": $rc}" >> "$OUT"
  sleep 20
  return $rc
}

run_step watchdog_512_20 1500 512 20 pn_fixed || true
run_step watchdog_256_80 1500 256 80 pn_fixed || true
run_step watchdog_512_40_iter 1500 512 40 iterative || true

echo DONE_ROUND5A2_CHAIN >> "$LOG"
