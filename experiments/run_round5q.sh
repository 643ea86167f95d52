#!/bin/bash
# Round-5 chain Q: the m=24 compile-wall probe (envelope mapping past
# the m=20 cap; extrapolated compile ~1.4 ks, timeout 5400 — started
# early in the session per the tunnel rules).
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
    echo "r5q: probe $i unhealthy $(date)" >> "$LOG"
    sleep 120
  done
  return 1
}

run_step() {
  name=$1; tmo=$2; shift 2
  if ! probe_retry; then
    echo "r5q: SKIP $name (tunnel never healthy) $(date)" >> "$LOG"
    return 98
  fi
  echo "=== r5q step $name $(date) ===" >> "$LOG"
  timeout "$tmo" "$@" >> "$OUT" 2>> "$LOG"
  rc=$?
  echo "r5q: $name rc=$rc $(date)" >> "$LOG"
  sleep 20
  return $rc
}

run_step m24_fused 5400 python experiments/m24_probe.py || true
echo DONE_ROUND5Q_CHAIN >> "$LOG"
