#!/bin/bash
# Fused-solver quadrotor (m=4) TPU benchmark. Waits for run_m4.sh to
# finish (one TPU process at a time; never fall through).
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH}"
OUT=experiments/secondary_results.jsonl
LOG=experiments/iter_variant_log.txt
ok=0
for i in $(seq 1 480); do
  if grep -q "DONE_M4" "$LOG" 2>/dev/null; then ok=1; break; fi
  sleep 60
done
[ "$ok" = 1 ] || { echo "m4_fused: m4 never finished, exiting $(date)" >> "$LOG"; exit 1; }
echo "=== m4_fused quadrotor $(date) ===" >> "$LOG"
SB_MODE=m4_fused timeout 3600 python experiments/secondary_bench.py >> "$OUT" 2>> "$LOG"
echo DONE_M4_FUSED >> "$LOG"
