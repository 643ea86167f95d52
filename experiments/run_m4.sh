#!/bin/bash
# Quadrotor m=4 vmap-path benchmarks: enum vs iterative boxQP. Waits for
# run_iter_secondary.sh to finish (one TPU process at a time; never fall
# through onto a busy/wedged tunnel).
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH}"
OUT=experiments/secondary_results.jsonl
LOG=experiments/iter_variant_log.txt
ok=0
for i in $(seq 1 480); do
  if grep -q "DONE_ITER_SECONDARY" "$LOG" 2>/dev/null; then ok=1; break; fi
  sleep 60
done
[ "$ok" = 1 ] || { echo "m4: secondary never finished, exiting $(date)" >> "$LOG"; exit 1; }
echo "=== m4 quadrotor (vmap path) $(date) ===" >> "$LOG"
for mode in m4_enum m4_iter; do
  echo "=== SB_MODE=$mode ===" >> "$LOG"
  SB_MODE=$mode timeout 3000 python experiments/secondary_bench.py >> "$OUT" 2>> "$LOG"
  sleep 5
done
echo DONE_M4 >> "$LOG"
