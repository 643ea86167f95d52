#!/bin/bash
# Round-5 chain P: the m=20 compile-wall probe (envelope mapping past
# the raised cap; extrapolated compile ~1.4-1.9 ks, timeout 5400 —
# started >6 h before the round boundary per the tunnel rules).
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
    echo "r5p: probe $i unhealthy $(date)" >> "$LOG"
    sleep 120
  done
  return 1
}

run_step() {
  name=$1; tmo=$2; shift 2
  if ! probe_retry; then
    echo "r5p: SKIP $name (tunnel never healthy) $(date)" >> "$LOG"
    return 98
  fi
  echo "=== r5p step $name $(date) ===" >> "$LOG"
  timeout "$tmo" "$@" >> "$OUT" 2>> "$LOG"
  rc=$?
  echo "r5p: $name rc=$rc $(date)" >> "$LOG"
  sleep 20
  return $rc
}

run_step m20_fused 5400 python experiments/m20_probe.py || true
echo DONE_ROUND5P_CHAIN >> "$LOG"
