#!/bin/bash
# Round-5 chain L: final verification — bench.py on the real chip (the
# driver will run it again at round end; this catches any regression
# from the round-5 changes first).
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
    echo "r5l: probe $i unhealthy $(date)" >> "$LOG"
    sleep 120
  done
  return 1
}

if probe_retry; then
  echo "=== r5l bench.py $(date) ===" >> "$LOG"
  timeout 1800 python bench.py > experiments/bench_r5_check.json 2>> "$LOG"
  echo "r5l: bench rc=$? $(date)" >> "$LOG"
fi
echo DONE_ROUND5L_CHAIN >> "$LOG"
