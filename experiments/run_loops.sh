#!/bin/bash
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH}"
OUT=experiments/loop_results.jsonl
for spec in "$@"; do
  IFS=: read -r mode t n <<< "$spec"
  n=${n:-64}
  echo "=== loop mode=$mode T=$t N=$n ===" >&2
  PROBE_MODE=$mode PROBE_T=$t PROBE_N=$n timeout 1800 python experiments/loop_probe.py >> "$OUT" 2>> experiments/loop_log.txt
  rc=$?
  if [ $rc -ne 0 ]; then echo "loop $spec failed rc=$rc" >> "$OUT"; fi
  sleep 2
done
echo DONE_ALL_LOOPS
