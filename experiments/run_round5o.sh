#!/bin/bash
# Round-5 chain O: the resident×mesh×AOT cell on the 1-device TPU mesh —
# save the sharded donated-state blob, then a fresh process serves from
# it and compares bit-exactly vs the unsharded baseline costs (chain K).
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
    echo "r5o: probe $i unhealthy $(date)" >> "$LOG"
    sleep 120
  done
  return 1
}

run_step() {
  name=$1; tmo=$2; shift 2
  if ! probe_retry; then
    echo "r5o: SKIP $name (tunnel never healthy) $(date)" >> "$LOG"
    return 98
  fi
  echo "=== r5o step $name $(date) ===" >> "$LOG"
  timeout "$tmo" "$@" >> "$OUT" 2>> "$LOG"
  rc=$?
  echo "r5o: $name rc=$rc $(date)" >> "$LOG"
  sleep 20
  return $rc
}

if run_step rm_aotsave 2400 env RM_MODE=aotsave \
    python experiments/resident_mesh_tpu.py; then
  run_step rm_aotserve 1200 env RM_MODE=aotserve \
    python experiments/resident_mesh_tpu.py || true
fi
echo DONE_ROUND5O_CHAIN >> "$LOG"
