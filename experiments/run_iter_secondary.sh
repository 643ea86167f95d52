#!/bin/bash
# Secondary workloads on the whole-iteration kernel. Waits for
# run_iter_variants.sh to finish (one TPU process at a time).
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH}"
OUT=experiments/secondary_results.jsonl
LOG=experiments/iter_variant_log.txt

# Wait for the variants run to finish (one TPU process at a time). Never
# fall through: if it never completes, exit rather than racing the tunnel.
ok=0
for i in $(seq 1 480); do
  if grep -q "DONE_ITER_VARIANTS" "$LOG" 2>/dev/null; then ok=1; break; fi
  sleep 60
done
[ "$ok" = 1 ] || { echo "secondary: variants never finished, exiting $(date)" >> "$LOG"; exit 1; }
echo "=== secondary (iter kernel) $(date) ===" >> "$LOG"
for mode in m2 m3 mpc mpc1; do
  echo "=== SB_MODE=$mode ===" >> "$LOG"
  SB_MODE=$mode timeout 3000 python experiments/secondary_bench.py >> "$OUT" 2>> "$LOG"
  sleep 5
done
echo DONE_ITER_SECONDARY >> "$LOG"
