#!/bin/bash
# Round-5 chain N: post-review-fix validation — a short resident soak
# through the existing blob (the state-commit path changed; confirm no
# serving regression on hardware).
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
    echo "r5n: probe $i unhealthy $(date)" >> "$LOG"
    sleep 120
  done
  return 1
}

if probe_retry; then
  echo "=== r5n resident_soak_postfix $(date) ===" >> "$LOG"
  timeout 1200 env SS_MODE=resident SS_SECONDS=30 SS_MIN_REPLANS=10000 \
    python experiments/serve_soak_tpu.py >> experiments/secondary_results.jsonl 2>> "$LOG"
  echo "r5n: resident_soak_postfix rc=$? $(date)" >> "$LOG"
fi
echo DONE_ROUND5N_CHAIN >> "$LOG"
