#!/bin/bash
# Round-5 chain B: the remaining TPU evidence, serialized on the tunnel.
#   1. mesh_aot save/serve   — sharded warm AOT executable, cross-process
#                              bit-exactness on the 1-device TPU mesh
#                              (VERDICT r4 items 2+3)
#   2. m16 fused probe       — MAX_FUSED_M=16 compile wall (item 6)
#   3. soak save + soak      — full-block warm serving, 10k+ replans,
#                              RSS stability (item 4)
# Waits for chain A4 to finish first. REQUIRED env: CHAIN_DEADLINE.
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
    echo "r5b: probe $i unhealthy $(date)" >> "$LOG"
    sleep 120
  done
  return 1
}

run_step() {
  name=$1; tmo=$2; shift 2
  now=$(date +%s)
  if [ "$DEADLINE" -gt 0 ] && [ "$now" -ge "$DEADLINE" ]; then
    echo "r5b: SKIP $name (past deadline) $(date)" >> "$LOG"; return 99
  fi
  # long compiles must never start near the deadline (a timeout-kill
  # mid-compile can wedge the pool — CLAUDE.md)
  if [ "$DEADLINE" -gt 0 ] && [ $((now + tmo)) -ge "$DEADLINE" ]; then
    echo "r5b: SKIP $name (would cross deadline) $(date)" >> "$LOG"
    return 99
  fi
  if ! probe_retry; then
    echo "r5b: SKIP $name (tunnel never healthy) $(date)" >> "$LOG"
    return 98
  fi
  echo "=== r5b step $name $(date) ===" >> "$LOG"
  timeout "$tmo" "$@" >> "$OUT" 2>> "$LOG"
  rc=$?
  echo "r5b: $name rc=$rc $(date)" >> "$LOG"
  sleep 20
  return $rc
}

for i in $(seq 1 240); do
  if grep -q "DONE_ROUND5A4_CHAIN" "$LOG" 2>/dev/null; then break; fi
  sleep 30
done
grep -q "DONE_ROUND5A4_CHAIN" "$LOG" || {
  echo "r5b: chain A4 never finished, exiting $(date)" >> "$LOG"; exit 1; }

# 1. sharded warm AOT: save, then cross-process reload + bit-exactness
if run_step mesh_aot_save 2400 env MA_MODE=save \
    python experiments/mesh_aot_tpu.py; then
  run_step mesh_aot_serve 1200 env MA_MODE=serve \
    python experiments/mesh_aot_tpu.py || true
fi

# 2. MAX_FUSED_M=16 compile-wall probe (long Mosaic compile)
run_step m16_fused 3300 python experiments/m16_probe.py || true

# 3. full-block warm serving soak
if run_step soak_save 2400 env SS_MODE=save \
    python experiments/serve_soak_tpu.py; then
  run_step soak 1800 env SS_MODE=soak \
    python experiments/serve_soak_tpu.py || true
fi

echo DONE_ROUND5B_CHAIN >> "$LOG"
