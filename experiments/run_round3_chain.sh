#!/bin/bash
# Round-3 measurement chain (VERDICT r2 items 1+2): the still-TPU-unmeasured
# workloads, one TPU process at a time, never falling through onto a wedged
# tunnel. Order: cheap/known programs first, the on-device fused-vs-XLA
# equivalence probes next, m4_fused LAST (its merged-sweep Mosaic compile is
# the biggest program in the chain; a timeout-kill mid-compile can re-wedge
# the pool, so nothing may run after it).
#
# REQUIRED env (epoch seconds): CHAIN_DEADLINE (last start for <=50-min
# steps), CHAIN_DEADLINE_FUSED (last start for the 90-min m4_fused step).
# Unset deadlines skip everything.
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH}"
OUT_S=experiments/secondary_results.jsonl
OUT_E=experiments/equiv_results.jsonl
LOG=experiments/round3_chain_log.txt

DEADLINE=${CHAIN_DEADLINE:-0}
DEADLINE_FUSED=${CHAIN_DEADLINE_FUSED:-0}
past_deadline() { [ "$(date +%s)" -ge "$DEADLINE" ]; }
past_deadline_fused() { [ "$(date +%s)" -ge "$DEADLINE_FUSED" ]; }

probe_healthy() {
  timeout 45 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((256,256)); y = np.asarray(x @ x)
assert y[0,0] == 256.0
print('HEALTHY')
" 2>/dev/null | grep -q HEALTHY
}

# Wait (up to ~20h) for a healthy tunnel before EVERY step: a mid-chain
# wedge must not cascade timeouts through the remaining steps.
wait_healthy() {
  for i in $(seq 1 150); do
    probe_healthy && return 0
    past_deadline && return 1
    echo "probe $i: wedged ($(date))" >> "$LOG"
    sleep 480
  done
  return 1
}

run() {  # env vars... script outfile
  local out="${@: -1}"
  local script="${@: -2:1}"
  past_deadline && { echo "deadline passed, skipping ${*:1:$#-2} $(date)" >> "$LOG"; return; }
  wait_healthy || { echo "tunnel never recovered before ${*:1:$#-2} $(date)" >> "$LOG"; return; }
  echo "=== ${*:1:$#-2} $script $(date) ===" >> "$LOG"
  env "${@:1:$#-2}" timeout 3000 python "$script" >> "$out" 2>> "$LOG"
  local rc=$?
  [ $rc -ne 0 ] && echo "{\"failed\": \"${*:1:$#-2} $script\", \"rc\": $rc}" >> "$out"
  sleep 5
}

echo "=== round-3 chain start $(date) deadline=$DEADLINE fused=$DEADLINE_FUSED ===" >> "$LOG"
run SB_MODE=mpc1 experiments/secondary_bench.py "$OUT_S"
run SB_MODE=m4_enum experiments/secondary_bench.py "$OUT_S"
run SB_MODE=m4_iter experiments/secondary_bench.py "$OUT_S"
run EQ_MODEL=acrobot experiments/equiv_tpu.py "$OUT_E"
run EQ_MODEL=double_integrator experiments/equiv_tpu.py "$OUT_E"
echo DONE_PRE_FUSED >> "$LOG"
if ! past_deadline_fused && wait_healthy; then
  echo "=== SB_MODE=m4_fused $(date) ===" >> "$LOG"
  SB_MODE=m4_fused timeout 5400 python experiments/secondary_bench.py >> "$OUT_S" 2>> "$LOG" \
    || echo '{"failed": "m4_fused"}' >> "$OUT_S"
else
  echo "skipping m4_fused (deadline/wedge) $(date)" >> "$LOG"
fi
echo DONE_ALL >> "$LOG"
