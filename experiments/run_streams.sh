#!/bin/bash
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH}"
OUT=experiments/streams_results.jsonl
for spec in "$@"; do
  j=${spec%%:*}
  t=${spec##*:}
  echo "=== streams J=$j T=$t ===" >&2
  PROBE_J=$j PROBE_T=$t timeout 1800 python experiments/streams_probe.py >> "$OUT" 2>> experiments/streams_log.txt
  rc=$?
  if [ $rc -ne 0 ]; then echo "streams $spec failed rc=$rc" >> "$OUT"; fi
  sleep 2
done
echo DONE_ALL_STREAMS
