"""Measure the backward pass's λ-retry distribution: how often the FIRST
λ attempt fails for any lane (each such iteration pays a full extra sweep
kernel call), and how often a retry needs a SECOND round (what a dual-λ
in-kernel design could NOT absorb).

Requires the TEMP instrumentation in ilqr_tpu/fused.py (search "TEMP"):
Solution.gnorm carries total retry rounds, Solution.dlam carries
iters_with_any_first_attempt_failure + 1000·iters_with_2plus_rounds.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

t0 = time.perf_counter()
a = jnp.ones((256, 256), jnp.float32)
(a @ a).block_until_ready()
print(f"[bt] health {time.perf_counter()-t0:.1f}s", file=sys.stderr,
      flush=True)

from ilqr_tpu import SolverConfig, get_model
from ilqr_tpu.fused import solve_batch_fused
from ilqr_tpu.models import acrobot as ac

model = get_model("acrobot")
params = ac.default_params()
cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True, max_iter=100)
rng = np.random.default_rng(0)
x0 = jnp.asarray(0.05 * rng.normal(size=(1024, 4)), jnp.float32)
u0 = jnp.zeros((1024, 499, 1), jnp.float32)
t0 = time.perf_counter()
sol = solve_batch_fused(model, params, cfg, 0.02, x0, u0)
rounds_total = int(round(float(np.asarray(sol.gnorm)[0])))
code = int(round(float(np.asarray(sol.dlam)[0])))
iters_with_any_fail = code % 1000
iters_with_2plus = code // 1000
total_iters = int(np.asarray(sol.iterations).max())
print(json.dumps({
    "B": 1024, "T": 499, "block_iterations": total_iters,
    "iters_with_any_first_attempt_failure": iters_with_any_fail,
    "iters_with_2plus_retry_rounds": iters_with_2plus,
    "total_retry_rounds": rounds_total,
    "trigger_rate": round(iters_with_any_fail / max(total_iters, 1), 3),
    "mean_rounds_per_iter": round(rounds_total / max(total_iters, 1), 2),
    "wall_s": round(time.perf_counter() - t0, 1),
}), flush=True)
