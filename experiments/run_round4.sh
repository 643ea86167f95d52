#!/bin/bash
# Round-4 TPU measurement chain — one TPU process at a time, health-gated,
# deadline-guarded (a timeout-kill mid-compile can wedge the tunnel for
# hours, so no step STARTS after its deadline; see CLAUDE.md).
#
# REQUIRED env:
#   CHAIN_DEADLINE  epoch seconds — last allowed start time for any step
# e.g.  CHAIN_DEADLINE=$(date -d '+5 hours' +%s) bash experiments/run_round4.sh
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH}"
OUT=experiments/secondary_results.jsonl
LOG=experiments/round4_log.txt
DEADLINE=${CHAIN_DEADLINE:-0}

probe() {
  timeout 45 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((256,256)); y = np.asarray(x @ x)
assert y[0,0] == 256.0
print('HEALTHY')
" 2>/dev/null | grep -q HEALTHY
}

# wait for a healthy tunnel (up to ~4 h, probing every 8 min)
ok=0
for i in $(seq 1 30); do
  if probe; then ok=1; echo "r4: healthy after $i probes $(date)" >> "$LOG"; break; fi
  echo "r4: probe $i unhealthy $(date)" >> "$LOG"
  sleep 480
done
[ "$ok" = 1 ] || { echo "r4: tunnel never healthy, aborting $(date)" >> "$LOG"; exit 1; }

run_step() {
  name=$1; tmo=$2; shift 2
  now=$(date +%s)
  if [ "$now" -ge "$DEADLINE" ]; then
    echo "r4: SKIP $name (past deadline) $(date)" >> "$LOG"; return 1
  fi
  if ! probe; then
    echo "r4: SKIP $name (tunnel unhealthy) $(date)" >> "$LOG"; return 1
  fi
  echo "=== r4 step $name $(date) ===" >> "$LOG"
  timeout "$tmo" "$@" >> "$OUT" 2>> "$LOG"
  rc=$?
  echo "r4: $name rc=$rc $(date)" >> "$LOG"
  sleep 10
  return $rc
}

# 1. m=12 pn_fixed vmap path (VERDICT item 1 "done" criterion)
run_step m12_pn 3000 env SB_MODE=m12_pn python experiments/secondary_bench.py

# 2. m=4 pn_fixed (the new 'auto' TPU behavior; before/after vs m4_iter 5.9/s)
run_step m4_pn 2500 env SB_MODE=m4_pn python experiments/secondary_bench.py

# 3. SolverService under concurrent Poisson load (VERDICT item 2)
run_step serve 3600 python experiments/serve_tpu.py

# 4+5. AOT executable serialization: save then cross-process load
run_step aot_save 2500 env AOT_MODE=save python experiments/aot_probe.py
run_step aot_load 1200 env AOT_MODE=load python experiments/aot_probe.py

# 6. profiler trace of the fused iteration (VERDICT item 6)
run_step trace 2500 python experiments/trace_probe.py

echo DONE_ROUND4_CHAIN >> "$LOG"
