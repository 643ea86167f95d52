#!/bin/bash
# Sequential TPU kernel probes — ONE process at a time on the axon tunnel.
# No aggressive timeouts: killing a process mid-compile can wedge the
# remote pool for hours (CLAUDE.md). 1800s is a generous last resort.
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH}"
OUT=${PROBE_OUT:-experiments/probe_results.jsonl}
for spec in "$@"; do
  mode=${spec%%:*}
  t=${spec##*:}
  echo "=== probe mode=$mode T=$t ===" >&2
  PROBE_MODE=$mode PROBE_T=$t timeout 1800 python experiments/kernel_probe.py >> "$OUT" 2>> experiments/probe_log.txt
  rc=$?
  echo "=== rc=$rc ===" >&2
  if [ $rc -ne 0 ]; then echo "probe $spec failed rc=$rc" >> "$OUT"; fi
  sleep 2
done
echo DONE_ALL_PROBES
