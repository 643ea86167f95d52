"""MAX_FUSED_M envelope, next step: m=24. Measured compile wall so far:
146-209 s (m=8), 386 s (m=12), 750 s (m=16), 1,065 s (m=20) — increments
are roughly linear (+364, +315), so m=24 extrapolates to ~1.4 ks. The
other wall candidate is VMEM: the projected-Newton scratch carries
several (m, m, 8, 128)-tile buffers (~2.4 MB each at m=24 per 1024-lane
block), so Mosaic may refuse allocation before the compile wall bites.
This probe patches the cap to 24, builds a 24-thruster ring via
models.thruster_ring.build_ring_model (not registered — probe-only),
and measures compile + solves/s, OR documents the wall as a
timeout/compile-error negative. Run with a 5,400 s timeout and NEVER
near the round boundary (a timeout-kill mid-compile can wedge the
tunnel — CLAUDE.md).
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

import ilqr_tpu.ops.pallas_sweep as ps

ps.MAX_FUSED_M = max(ps.MAX_FUSED_M, 24)  # probe patch

from ilqr_tpu import SolverConfig  # noqa: E402
from ilqr_tpu.fused import solve_batch_fused  # noqa: E402
from ilqr_tpu.models.thruster_ring import build_ring_model  # noqa: E402

B = int(os.environ.get("M24_B", "1024"))
T = 80

model, default_params = build_ring_model(24, "thruster_ring24_probe")
params = jax.tree_util.tree_map(
    lambda a: jnp.asarray(a, jnp.float32), default_params())
cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                   max_iter=40, boxqp_mode="auto")
rng = np.random.default_rng(0)
x0 = jnp.asarray(0.2 * rng.normal(size=(B, 6)), jnp.float32)
u0 = jnp.zeros((T, 24), jnp.float32)

t0 = time.perf_counter()
sol = solve_batch_fused(model, params, cfg, 0.05, x0, u0)
cost = np.asarray(sol.cost)
first = time.perf_counter() - t0
reps = []
for _ in range(3):
    x0r = jnp.asarray(0.2 * rng.normal(size=(B, 6)), jnp.float32)
    t0 = time.perf_counter()
    sol = solve_batch_fused(model, params, cfg, 0.05, x0r, u0)
    np.asarray(sol.cost)
    reps.append(time.perf_counter() - t0)
us = np.asarray(sol.us)
print(json.dumps({
    "mode": "m24_fused", "B": B, "T": T,
    "solves_per_s": round(B / min(reps), 1),
    "best_s": round(min(reps), 4), "first_s": round(first, 1),
    "mean_cost": round(float(cost.mean()), 4),
    "mean_iters": round(float(np.asarray(sol.iterations).mean()), 1),
    "frac_at_lower": round(float((us <= 1e-6).mean()), 3),
}), flush=True)
