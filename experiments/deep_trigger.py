"""Measure the stage-2 trigger rate for a would-be 2-stage line search.

Requires the TEMP instrumentation in ilqr_tpu/fused.py that accumulates
(any gated lane selected alpha < alphas[2] or rejected all candidates)
into the expected field (exposed via Solution.gnorm) as
count_trigger + 1000 * count_all_rejected.
"""
import time, sys, json
import jax, jax.numpy as jnp, numpy as np

t0 = time.perf_counter()
a = jnp.ones((256, 256), jnp.float32)
(a @ a).block_until_ready()
print(f"[deep] health {time.perf_counter()-t0:.1f}s", file=sys.stderr,
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
code = float(np.asarray(sol.gnorm)[0])
total_iters = int(np.asarray(sol.iterations).max())
mean_iters = float(np.asarray(sol.iterations).mean())
trig = int(round(code)) % 1000
rej = int(round(code)) // 1000
print(json.dumps({
    "B": 1024, "T": 499, "block_iterations": total_iters,
    "mean_lane_iterations": round(mean_iters, 1),
    "stage2_trigger_iters": trig,
    "all_rejected_iters": rej,
    "trigger_rate": round(trig / max(total_iters, 1), 3),
    "wall_s": round(time.perf_counter() - t0, 1),
}), flush=True)
