#!/bin/bash
# Round-5 chain R: m=24 AOT serving evidence (compile-once-serve-fast
# at the new cap). Two sequential TPU processes: save (pays the ~2.2 ks
# m=24 compile, timeout 5400) then serve (fresh process from the blob).
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH}"
OUT=experiments/secondary_results.jsonl
LOG=experiments/round5_log.txt

probe_retry() {
  for i in $(seq 1 12); do
    if timeout 150 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((256,256)); y = np.asarray(x @ x)
assert y[0,0] == 256.0
print('HEALTHY')
" 2>/dev/null | grep -q HEALTHY; then return 0; fi
    echo "r5r: probe $i unhealthy $(date)" >> "$LOG"
    sleep 120
  done
  return 1
}

run_step() {
  name=$1; tmo=$2; shift 2
  if ! probe_retry; then
    echo "r5r: SKIP $name (tunnel never healthy) $(date)" >> "$LOG"
    return 98
  fi
  echo "=== r5r step $name $(date) ===" >> "$LOG"
  timeout "$tmo" "$@" >> "$OUT" 2>> "$LOG"
  rc=$?
  echo "r5r: $name rc=$rc $(date)" >> "$LOG"
  sleep 20
  return $rc
}

M24_MODE=save run_step m24_aot_save 5400 python experiments/m24_aot_tpu.py \
  && M24_MODE=serve run_step m24_aot_serve 1800 python experiments/m24_aot_tpu.py
echo DONE_ROUND5R_CHAIN >> "$LOG"
