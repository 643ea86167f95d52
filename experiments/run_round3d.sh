#!/bin/bash
# Round-3 continuation chain: the m=4/6/8 fused workloads at B=8192, where
# chunk dispatches overlap the ~26 ms RPC floor (BENCH_NOTES B-sweep) and
# the measured rate equals the device-true ceiling. Same compiled 1024-lane
# block program as the B=1024 runs — no new Mosaic program shapes.
# Sequential (one TPU process at a time); generous timeouts.
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH}"
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
OUT=experiments/secondary_results.jsonl
LOG=experiments/round3d_log.txt
for mode in m8_fused m6_fused m4_fused; do
  echo "=== ${mode} B=8192 $(date) ===" >> "$LOG"
  SB_MODE=$mode SB_BATCH=8192 timeout 5400 python experiments/secondary_bench.py >> "$OUT" 2>> "$LOG"
  echo "rc=$? DONE_${mode}_B8192 $(date)" >> "$LOG"
  sleep 10
done
