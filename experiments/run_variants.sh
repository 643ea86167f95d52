#!/bin/bash
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH}"
OUT=experiments/variant_results.jsonl
for spec in "$@"; do
  IFS=: read -r a tb stb un <<< "$spec"
  echo "=== variant A=$a TB=$tb STB=$stb U=$un ===" >&2
  VAR_ALPHAS=$a VAR_TB=$tb VAR_STB=${stb:-8} VAR_UNROLL=${un:-4} timeout 1800 python experiments/bench_variant.py >> "$OUT" 2>> experiments/variant_log.txt
  rc=$?
  if [ $rc -ne 0 ]; then echo "variant $spec failed rc=$rc" >> "$OUT"; fi
  sleep 2
done
echo DONE_ALL_VARIANTS
