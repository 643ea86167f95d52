#!/bin/bash
# Round-3 continuation chain (free_flyer, m=8): the fused-solver benchmark
# at the MAX_FUSED_M cap, then the on-device fused-vs-XLA equivalence
# probe. Sequential (one TPU process at a time); generous timeouts so no
# process is ever killed mid-compile.
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH}"
# Persistent compilation cache: the compile_cache_probe showed the axon
# plugin writes cache entries; this chain doubles as the big-program test
# (run 2 of m8_fused tells whether the 100-200 s Mosaic compile is reused
# across processes).
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
OUT=experiments/secondary_results.jsonl
EQOUT=experiments/equiv_results.jsonl
LOG=experiments/round3c_log.txt
echo "=== m8_fused free_flyer run1 $(date) ===" >> "$LOG"
SB_MODE=m8_fused timeout 5400 python experiments/secondary_bench.py >> "$OUT" 2>> "$LOG"
echo "rc=$? DONE_M8_FUSED_RUN1 $(date)" >> "$LOG"
sleep 10
echo "=== m8_fused free_flyer run2 (compile-cache test) $(date) ===" >> "$LOG"
SB_MODE=m8_fused timeout 5400 python experiments/secondary_bench.py >> "$OUT" 2>> "$LOG"
echo "rc=$? DONE_M8_FUSED_RUN2 $(date)" >> "$LOG"
sleep 10
echo "=== equiv free_flyer $(date) ===" >> "$LOG"
EQ_MODEL=free_flyer timeout 5400 python experiments/equiv_tpu.py >> "$EQOUT" 2>> "$LOG"
echo "rc=$? DONE_EQUIV_M8 $(date)" >> "$LOG"
