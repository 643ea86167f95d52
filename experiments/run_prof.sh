#!/bin/bash
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH}"
OUT=experiments/prof_results.jsonl
for spec in "$@"; do
  IFS=: read -r stage t tb <<< "$spec"
  tb=${tb:-8}
  echo "=== prof stage=$stage T=$t TB=$tb ===" >&2
  PROBE_STAGE=$stage PROBE_T=$t PROBE_TB=$tb timeout 1800 python experiments/fused_profile.py >> "$OUT" 2>> experiments/prof_log.txt
  rc=$?
  if [ $rc -ne 0 ]; then echo "prof $spec failed rc=$rc" >> "$OUT"; fi
  sleep 2
done
echo DONE_ALL_PROF
