#!/bin/bash
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH}"
OUT=experiments/prof2_results.jsonl
for stage in empty sweep ls; do
  echo "=== stage $stage ===" >&2
  PROBE_STAGE=$stage PROBE_TB=32 PROBE_STB=32 timeout 1500 python experiments/fused_profile.py >> "$OUT" 2>> experiments/prof2_log.txt
  rc=$?
  if [ $rc -ne 0 ]; then echo "{\"stage\": \"$stage\", \"failed_rc\": $rc}" >> "$OUT"; fi
  sleep 3
done
echo DONE_PROF2
