#!/bin/bash
# Whole-iteration-kernel TPU measurements. Waits for the tunnel probe loop
# (/tmp/tpu_probe.log) to report HEALTHY, then runs each variant as its own
# sequential TPU process (one new program per process — axon discipline).
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH}"
OUT=experiments/variant_results.jsonl
LOG=experiments/iter_variant_log.txt

# Wait until the probe loop reports HEALTHY. NEVER fall through to a wedged
# tunnel: if the wait budget expires or the probe gives up, exit instead
# (a timeout-killed python mid-device-init can re-wedge the pool).
ok=0
for i in $(seq 1 360); do
  if grep -q "TPU HEALTHY" /tmp/tpu_probe.log 2>/dev/null; then ok=1; break; fi
  grep -q "never recovered" /tmp/tpu_probe.log 2>/dev/null && { echo "probe gave up $(date)" >> "$LOG"; exit 1; }
  sleep 60
done
[ "$ok" = 1 ] || { echo "wait budget expired, still wedged $(date)" >> "$LOG"; exit 1; }
echo "=== starting iter-kernel variants $(date) ===" >> "$LOG"

run() {
  echo "=== $* ===" >> "$LOG"
  env "$@" timeout 3000 python experiments/bench_variant.py >> "$OUT" 2>> "$LOG"
  rc=$?
  [ $rc -ne 0 ] && echo "{\"failed\": \"$*\", \"rc\": $rc}" >> "$OUT"
  sleep 5
}

run VAR_ITER=merged VAR_ITB=16
run VAR_ITER=merged VAR_ITB=32
run VAR_ITER=split VAR_TB=32 VAR_STB=32
echo "=== bench.py $(date) ===" >> "$LOG"
timeout 3600 python bench.py >> experiments/bench_iter_result.txt 2>> "$LOG"
echo DONE_ITER_VARIANTS >> "$LOG"
echo DONE_ITER_VARIANTS
