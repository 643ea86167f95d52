#!/bin/bash
# Round-5 chain A: bisect the m=12 vmap-path TPU worker fault boundary
# in B (VERDICT r4 item 1). Round 4: B=64 runs, B=1024 crashes the
# worker ("kernel fault", kernels on or off, CPU-valid program).
# Adaptive: first re-confirm the crash cheaply (iters=4), bisect down,
# then re-confirm the largest safe B at the original 40 iters, and
# finally ask whether the ITERATIVE boxQP crashes at the faulting B
# (informs boxqp auto-mode policy). One TPU process per step; a crash
# kills only that process (pool recovers ~2 min, round-4 observation).
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
    echo "r5a: probe $i unhealthy $(date)" >> "$LOG"
    sleep 120
  done
  return 1
}

run_step() {
  # run_step NAME TIMEOUT B ITERS QP -> rc (0 = ran; nonzero = crash/
  # timeout — step outcome recorded either way)
  name=$1; tmo=$2; b=$3; iters=$4; qp=$5
  now=$(date +%s)
  if [ "$DEADLINE" -gt 0 ] && [ "$now" -ge "$DEADLINE" ]; then
    echo "r5a: SKIP $name (past deadline) $(date)" >> "$LOG"; return 99
  fi
  if ! probe_retry; then
    echo "r5a: SKIP $name (tunnel never healthy) $(date)" >> "$LOG"
    return 98
  fi
  echo "=== r5a step $name B=$b iters=$iters qp=$qp $(date) ===" >> "$LOG"
  timeout "$tmo" env MB_B="$b" MB_ITERS="$iters" MB_QP="$qp" \
    python experiments/m12_bisect.py >> "$OUT" 2>> "$LOG"
  rc=$?
  echo "r5a: $name rc=$rc $(date)" >> "$LOG"
  echo "{\"mode\": \"m12_bisect_rc\", \"B\": $b, \"iters\": $iters, \"qp\": \"$qp\", \"rc\": $rc}" >> "$OUT"
  sleep 20
  return $rc
}

SAFE_B=64   # proven in round 4
CRASH_B=0

# 1) cheap crash re-confirmation at the round-4 faulting shape
if run_step confirm_1024 1200 1024 4 pn_fixed; then
  # survived at iters=4 — try the original 40-iter config
  if run_step confirm_1024_full 3000 1024 40 pn_fixed; then
    SAFE_B=1024
    echo "r5a: B=1024 no longer crashes (iters=4 and 40)" >> "$LOG"
  else
    CRASH_B=1024
  fi
else
  CRASH_B=1024
fi

# 2) bisect down at iters=4 (only if 1024 crashed)
if [ "$CRASH_B" = "1024" ]; then
  for b in 512 256 128; do
    if run_step bisect_$b 1200 $b 4 pn_fixed; then
      SAFE_B=$b
      break
    else
      CRASH_B=$b
    fi
  done
fi

# 3) re-confirm the largest safe B at the original 40 iters
if [ "$SAFE_B" -gt 64 ] && [ "$SAFE_B" -lt 1024 ]; then
  if ! run_step confirm_safe_full 3000 $SAFE_B 40 pn_fixed; then
    echo "r5a: SAFE_B=$SAFE_B failed at 40 iters — demoting" >> "$LOG"
    CRASH_B=$SAFE_B
    SAFE_B=$((SAFE_B / 2))
    run_step confirm_half_full 3000 $SAFE_B 40 pn_fixed || SAFE_B=64
  fi
fi

# 4) does the ITERATIVE boxQP crash at the faulting B too? (auto-mode
# policy evidence; its while_loops make tracing slow — generous timeout)
if [ "$CRASH_B" -gt 0 ]; then
  run_step iterative_at_crash 3000 $CRASH_B 4 iterative || true
fi

echo "r5a: RESULT SAFE_B=$SAFE_B CRASH_B=$CRASH_B $(date)" >> "$LOG"
echo DONE_ROUND5A_CHAIN >> "$LOG"
