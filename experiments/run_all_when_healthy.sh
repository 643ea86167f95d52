#!/bin/bash
# Measurement supervisor: probes the TPU tunnel every 8 min (indefinitely,
# up to ~20 h), and once HEALTHY runs the full measurement chain
# sequentially — one TPU process at a time, never falling through onto a
# wedged tunnel. Replaces the fragile probe-log + multi-waiter setup.
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH}"
OUT_V=experiments/variant_results.jsonl
OUT_S=experiments/secondary_results.jsonl
LOG=experiments/iter_variant_log.txt

ok=0
for i in $(seq 1 150); do
  if timeout 45 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((256,256)); y = np.asarray(x @ x)
assert y[0,0] == 256.0
print('HEALTHY')
" 2>/dev/null | grep -q HEALTHY; then
    ok=1
    echo "TPU HEALTHY after $i probes ($(date))" >> /tmp/tpu_probe.log
    break
  fi
  echo "probe4 $i: still wedged ($(date))" >> /tmp/tpu_probe.log
  sleep 480
done
[ "$ok" = 1 ] || { echo "supervisor: never recovered $(date)" >> "$LOG"; exit 1; }

# Hard deadline (epoch): stop STARTING new steps near the round's end so
# the driver's own bench.py never races a chain process on the tunnel
# (one TPU process at a time). REQUIRED: pass deadlines via env —
#   CHAIN_DEADLINE        last start time for regular steps (<=50 min each)
#   CHAIN_DEADLINE_FUSED  last start time for the m4_fused step (90 min);
# e.g. CHAIN_DEADLINE=$(date -d '+4 hours' +%s). Defaults ($now) skip
# everything rather than guess — a timeout-kill mid-compile near the round
# end can wedge the tunnel for hours and destroy the driver's own bench.
# Default 0 (not $now): with -ge below, an unset deadline reliably skips
# every step — $now with -gt let the first step start in the same second.
DEADLINE=${CHAIN_DEADLINE:-0}
DEADLINE_FUSED=${CHAIN_DEADLINE_FUSED:-0}
past_deadline() { [ "$(date +%s)" -ge "$DEADLINE" ]; }
past_deadline_fused() { [ "$(date +%s)" -ge "$DEADLINE_FUSED" ]; }

echo "=== starting measurement chain $(date) ===" >> "$LOG"
run() {  # env vars... script outfile
  local out="${@: -1}"
  local script="${@: -2:1}"
  past_deadline && { echo "deadline passed, skipping ${*:1:$#-2} $(date)" >> "$LOG"; return; }
  echo "=== ${*:1:$#-2} $script $(date) ===" >> "$LOG"
  env "${@:1:$#-2}" timeout 3000 python "$script" >> "$out" 2>> "$LOG"
  local rc=$?
  [ $rc -ne 0 ] && echo "{\"failed\": \"${*:1:$#-2} $script\", \"rc\": $rc}" >> "$out"
  sleep 5
}

# Already measured (2026-08-18/19, see *_results.jsonl + BENCH_NOTES.md):
# iter-kernel variants, bench.py (29101 solves/s, merged iter kernel),
# SB_MODE=m2/m3/mpc. Only the still-missing steps remain below; re-enable
# the others by uncommenting if a code change invalidates their numbers.
# run VAR_ITER=merged VAR_ITB=16 experiments/bench_variant.py "$OUT_V"
# run VAR_ITER=merged VAR_ITB=32 experiments/bench_variant.py "$OUT_V"
# run VAR_ITER=split VAR_TB=32 VAR_STB=32 experiments/bench_variant.py "$OUT_V"
# past_deadline || BENCH_HEALTH_BUDGET_S=600 timeout 3600 python bench.py >> experiments/bench_iter_result.txt 2>> "$LOG"
# for mode in m2 m3 mpc; do run SB_MODE=$mode experiments/secondary_bench.py "$OUT_S"; done
echo DONE_ITER_VARIANTS >> "$LOG"
for mode in mpc1 m4_enum m4_iter; do
  run SB_MODE=$mode experiments/secondary_bench.py "$OUT_S"
done
# m4_fused LAST: its merged-sweep Mosaic compile is the biggest program in
# the chain; a timeout-kill mid-compile can re-wedge the tunnel, so nothing
# may run after it. Generous timeout for the same reason.
echo "=== SB_MODE=m4_fused $(date) ===" >> "$LOG"
past_deadline_fused || SB_MODE=m4_fused timeout 5400 python experiments/secondary_bench.py >> "$OUT_S" 2>> "$LOG" || echo '{"failed": "m4_fused"}' >> "$OUT_S"
echo DONE_ITER_SECONDARY >> "$LOG"
echo DONE_M4 >> "$LOG"
echo DONE_M4_FUSED >> "$LOG"
echo DONE_ALL >> "$LOG"
