"""Bench variants for profiling the fused iteration's cost split.

Env: VAR_ALPHAS (candidate count, default 11), VAR_TB (ls time block),
VAR_MAXIT, VAR_B, VAR_UNROLL, VAR_SWEEP (merged|split),
VAR_ITER (auto|merged|split — the whole-iteration kernel), VAR_ITB
(iter_time_block).
Semantics change with VAR_ALPHAS != 11 — profiling only.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ilqr_tpu import SolverConfig, get_model
from ilqr_tpu.config import DEFAULT_ALPHAS
from ilqr_tpu.fused import solve_batch_fused
from ilqr_tpu.models import acrobot as ac

A = int(os.environ.get("VAR_ALPHAS", "11"))
TB = int(os.environ.get("VAR_TB", "8"))
MAXIT = int(os.environ.get("VAR_MAXIT", "100"))
B = int(os.environ.get("VAR_B", "1024"))
UNROLL = int(os.environ.get("VAR_UNROLL", "4"))
SWEEP = os.environ.get("VAR_SWEEP", "merged")
STB = int(os.environ.get("VAR_STB", "8"))
ITER = os.environ.get("VAR_ITER", "auto")
ITB = int(os.environ.get("VAR_ITB", "16"))


def main():
    t0 = time.perf_counter()
    a = jnp.ones((256, 256), jnp.float32)
    (a @ a).block_until_ready()
    print(f"[var] health {time.perf_counter() - t0:.1f}s", file=sys.stderr,
          flush=True)

    model = get_model("acrobot")
    params = ac.default_params()
    cfg = SolverConfig(
        deriv_mode="analytic", clamp_forward=True, max_iter=MAXIT,
        alphas=DEFAULT_ALPHAS[:A], ls_time_block=TB, fused_unroll=UNROLL,
        sweep_kernel=SWEEP, sweep_time_block=STB,
        iter_kernel=ITER, iter_time_block=ITB)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(0.05 * rng.normal(size=(B, 4)), jnp.float32)
    u0 = jnp.zeros((B, 499, 1), jnp.float32)

    t0 = time.perf_counter()
    sol = solve_batch_fused(model, params, cfg, 0.02, x0, u0)
    np.asarray(sol.cost)
    first = time.perf_counter() - t0
    times = []
    for _ in range(4):
        x0r = jnp.asarray(0.05 * rng.normal(size=(B, 4)), jnp.float32)
        t0 = time.perf_counter()
        sol = solve_batch_fused(model, params, cfg, 0.02, x0r, u0)
        np.asarray(sol.cost)
        times.append(time.perf_counter() - t0)
    print(json.dumps({
        "A": A, "TB": TB, "STB": STB, "maxit": MAXIT, "B": B,
        "unroll": UNROLL,
        "sweep": SWEEP, "iter": ITER, "itb": ITB,
        "best_s": round(min(times), 4),
        "per_iter_us": round(min(times) / MAXIT * 1e6, 1),
        "first_s": round(first, 1),
        "mean_cost": round(float(jnp.mean(sol.cost)), 4),
    }), flush=True)


if __name__ == "__main__":
    main()
