#!/bin/bash
# Round-3 continuation chain: m6_fused benchmark, then the on-device
# check_vma sharded-fused validation. Sequential (one TPU process at a
# time); generous timeouts so no process is ever killed mid-compile.
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH}"
OUT=experiments/secondary_results.jsonl
LOG=experiments/round3b_log.txt
echo "=== m6_fused omni_thruster $(date) ===" >> "$LOG"
SB_MODE=m6_fused timeout 5400 python experiments/secondary_bench.py >> "$OUT" 2>> "$LOG"
echo "rc=$? DONE_M6_FUSED $(date)" >> "$LOG"
sleep 10
echo "=== checkvma sharded fused $(date) ===" >> "$LOG"
timeout 5400 python experiments/checkvma_tpu.py >> "$OUT" 2>> "$LOG"
echo "rc=$? DONE_CHECKVMA $(date)" >> "$LOG"
