"""Batched solves: the parallelism story of this framework.

The reference solves exactly one problem per process (ref: src/run_ilqr.cpp);
its only parallelism attempt was OpenMP over the finite-difference time loop,
disabled for nondeterminism (ref: notes.md:12, derivatives.cpp:18-123).

Here the WHOLE solver is vmapped over problems (initial states, goals, limits
— anything in params), so one device runs thousands of independent iLQR solves
in lock-step: every matrix op in the backward scan and every rollout becomes a
large batched kernel that XLA maps onto the MXU/VPU. Multi-chip scaling shards
the batch axis over a mesh (see ilqr_tpu.parallel).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp

from ilqr_tpu.config import SolverConfig
from ilqr_tpu.models.base import Model
from ilqr_tpu.solver import solve
from ilqr_tpu.types import Solution


def solve_batch(
    model: Model,
    params,
    cfg: SolverConfig,
    dt,
    x0,           # (B, n)
    u0,           # (B, T, m) or (T, m) broadcast to the batch
    params_batched: bool = False,
) -> Solution:
    """vmap the full solver over a batch of problems.

    ``params_batched=True`` means every leaf of ``params`` carries a leading
    batch axis (e.g. per-problem goals); otherwise params are shared.
    """
    if u0.ndim == 2:
        u0 = jnp.broadcast_to(u0[None], (x0.shape[0],) + u0.shape)
    in_axes = (0 if params_batched else None, 0, 0)
    fn = lambda p, x, u: solve(model, p, cfg, dt, x, u)
    return jax.vmap(fn, in_axes=in_axes)(params, x0, u0)


def make_batch_solver(model: Model, cfg: SolverConfig, params_batched=False):
    """jit-compiled batched solver."""
    return jax.jit(
        functools.partial(
            solve_batch, model, cfg=cfg, params_batched=params_batched
        )
    )


def convergence_stats(sol: Solution):
    """Batch-level convergence statistics (what the reference prints per-solve
    via SHOWPROGRESS, aggregated)."""
    return {
        "mean_cost": jnp.mean(sol.cost),
        "max_cost": jnp.max(sol.cost),
        "mean_iterations": jnp.mean(sol.iterations.astype(jnp.float32)),
        "converged_frac": jnp.mean((sol.reason != 4).astype(jnp.float32)),
        "mean_gnorm": jnp.mean(sol.gnorm),
    }
