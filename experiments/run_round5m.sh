#!/bin/bash
# Round-5 chain M: small-fleet resident latency (32 controllers,
# lock-step waves) — the apples-to-apples vs round-4 serve_warm_mpc.
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH}"
LOG=experiments/round5_log.txt

probe_retry() {
  for i in $(seq 1 12); do
    if timeout 150 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((256,256)); y = np.asarray(x @ x)
assert y[0,0] == 256.0
print('HEALTHY')
" 2>/dev/null | grep -q HEALTHY; then return 0; fi
    echo "r5m: probe $i unhealthy $(date)" >> "$LOG"
    sleep 120
  done
  return 1
}

for i in $(seq 1 120); do
  if grep -q "DONE_ROUND5L_CHAIN" "$LOG" 2>/dev/null; then break; fi
  sleep 30
done
if probe_retry; then
  echo "=== r5m resident_small $(date) ===" >> "$LOG"
  timeout 2400 python experiments/resident_small_tpu.py >> experiments/secondary_results.jsonl 2>> "$LOG"
  echo "r5m: resident_small rc=$? $(date)" >> "$LOG"
fi
echo DONE_ROUND5M_CHAIN >> "$LOG"
