#!/bin/bash
# Round-4 follow-up chain: the steps run_round4.sh skipped on flaky
# probes (m12_pn, m4_pn) plus the m12_fused compile-wall probe at the
# raised MAX_FUSED_M=12 cap. Retrying probes (the single-shot probe in
# run_round4.sh skipped steps when the freshly-recovered tunnel dropped
# one probe).
#
# REQUIRED env: CHAIN_DEADLINE (epoch) — last allowed start for regular
# steps; the m12_fused step (unknown Mosaic compile, budget 4500 s)
# additionally requires >= 2 h of headroom before CHAIN_DEADLINE_FUSED.
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH}"
OUT=experiments/secondary_results.jsonl
LOG=experiments/round4_log.txt
DEADLINE=${CHAIN_DEADLINE:-0}
DEADLINE_FUSED=${CHAIN_DEADLINE_FUSED:-0}

probe_retry() {
  # up to 12 probes, 120 s apart — returns 0 on first healthy. 150 s
  # timeout: device init through the tunnel takes 45-60 s in its slow
  # state, and a timeout-kill mid-init is exactly the pattern that wedges
  # the pool — give init generous headroom.
  for i in $(seq 1 12); do
    if timeout 150 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((256,256)); y = np.asarray(x @ x)
assert y[0,0] == 256.0
print('HEALTHY')
" 2>/dev/null | grep -q HEALTHY; then return 0; fi
    echo "r4b: probe $i unhealthy $(date)" >> "$LOG"
    sleep 120
  done
  return 1
}

run_step() {
  name=$1; tmo=$2; dl=$3; shift 3
  now=$(date +%s)
  if [ "$now" -ge "$dl" ]; then
    echo "r4b: SKIP $name (past deadline) $(date)" >> "$LOG"; return 1
  fi
  if ! probe_retry; then
    echo "r4b: SKIP $name (tunnel never healthy) $(date)" >> "$LOG"; return 1
  fi
  echo "=== r4b step $name $(date) ===" >> "$LOG"
  timeout "$tmo" "$@" >> "$OUT" 2>> "$LOG"
  rc=$?
  echo "r4b: $name rc=$rc $(date)" >> "$LOG"
  sleep 30
  return $rc
}

# wait for the first chain to finish (one TPU process at a time)
for i in $(seq 1 480); do
  if grep -q "DONE_ROUND4_CHAIN" "$LOG" 2>/dev/null; then break; fi
  sleep 60
done
grep -q "DONE_ROUND4_CHAIN" "$LOG" || {
  echo "r4b: first chain never finished, exiting $(date)" >> "$LOG"; exit 1; }

run_step m12_pn 3000 "$DEADLINE" env SB_MODE=m12_pn python experiments/secondary_bench.py
run_step m4_pn 2500 "$DEADLINE" env SB_MODE=m4_pn python experiments/secondary_bench.py
# the compile-wall probe: start ONLY with >= 2 h of headroom
run_step m12_fused 4500 "$DEADLINE_FUSED" env SB_MODE=m12_fused python experiments/secondary_bench.py

echo DONE_ROUND4B_CHAIN >> "$LOG"
