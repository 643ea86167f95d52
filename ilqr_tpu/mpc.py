"""Receding-horizon MPC on top of the warm-started solver.

The reference exposes the warm-start overload ``generate_trajectory(x0)``
precisely for MPC (ref: src/ilqr_core.cpp:65-76; intent at notes.md:11) but
ships no replanning loop, and its λ/dλ carry-over happens through mutable
file-scope statics (ref: include/ilqr.h:17-18). Here the MPC step is a pure
function over an explicit :class:`MPCState` pytree:

  1. simulate/observe one step with the current plan's first control
     (+feedback),
  2. shift the control sequence by one step (receding horizon, last control
     repeated),
  3. re-solve warm-started from the shifted plan with carried λ/dλ.

Everything jits and vmaps, so a fleet of thousands of MPC controllers runs
in lock-step on one chip (the BASELINE.json "batched MPC" config).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ilqr_tpu.config import SolverConfig
from ilqr_tpu.models.base import Model, get_integrator
from ilqr_tpu.solver import (
    _cast_params,
    _masked_iteration,
    _solution,
    init_state,
)
from ilqr_tpu.types import Solution


class MPCState(NamedTuple):
    """Controller state between replanning steps — a small pytree, so
    checkpoint/resume of a whole MPC fleet is a single array save
    (SURVEY §5 checkpoint/resume)."""

    x: jnp.ndarray        # current (observed) state
    plan: Solution        # last solution; plan.us[0] is the next control
    t: jnp.ndarray        # controller step counter


def mpc_init(model: Model, params, cfg: SolverConfig, dt, x0, u0) -> MPCState:
    """Initial plan from a cold start."""
    from ilqr_tpu.solver import solve

    sol = solve(model, params, cfg, dt, x0, u0)
    return MPCState(x=jnp.asarray(x0), plan=sol, t=jnp.zeros((), jnp.int32))


def _shift_controls(us):
    """Receding-horizon shift: drop u[0], repeat u[-1]."""
    return jnp.concatenate([us[1:], us[-1:]], axis=0)


def mpc_step(
    model: Model, params, cfg: SolverConfig, dt, state: MPCState,
    disturbance=None,
) -> MPCState:
    """One replanning cycle. ``disturbance`` (optional, shape (n,)) is added
    to the simulated next state to exercise feedback."""
    integ = get_integrator(cfg.integrator)
    plan = state.plan
    # like solve(): the replan's dtype follows the controller state (under
    # x64, f64 default_params + an f32 plan would poison loop carries)
    params = _cast_params(params, jnp.asarray(state.x).dtype)

    # Apply the plan's first control with its feedback correction.
    u0 = plan.us[0] + plan.K[0] @ (state.x - plan.xs[0])
    if cfg.clamp_forward:
        u0 = jnp.minimum(params.u_max, jnp.maximum(u0, params.u_min))
    x_next = integ(model, params, state.x, u0, dt)
    if disturbance is not None:
        x_next = x_next + disturbance

    # Warm-started re-solve from the shifted plan with explicit λ carry-over
    # (the reference's static-global behavior made explicit).
    us_shift = _shift_controls(plan.us)
    xs_shift = jnp.concatenate([plan.xs[1:], plan.xs[-1:]], axis=0)
    K_shift = jnp.concatenate([plan.K[1:], plan.K[-1:]], axis=0)
    st = init_state(
        model, params, cfg, dt, x_next, us_shift,
        lam=plan.lam, dlam=plan.dlam, warm_xs=xs_shift, warm_K=K_shift,
    )

    def cond(s):
        return jnp.logical_and(~s.done, s.iteration < cfg.max_iter)

    st = jax.lax.while_loop(
        cond, functools.partial(_masked_iteration, model, params, cfg, dt), st
    )
    return MPCState(x=x_next, plan=_solution(st, cfg), t=state.t + 1)


def make_mpc_controller(model: Model, cfg: SolverConfig, dt):
    """Returns (init_fn, step_fn), both jitted; step_fn vmaps for fleets."""
    init_fn = jax.jit(
        functools.partial(mpc_init, model, cfg=cfg, dt=dt)
    )
    step_fn = jax.jit(
        functools.partial(mpc_step, model, cfg=cfg, dt=dt)
    )
    return init_fn, step_fn


def run_mpc(
    model: Model, params, cfg: SolverConfig, dt, x0, u0, n_steps: int,
) -> tuple:
    """Convenience driver: n_steps replanning cycles as one lax.scan.
    Returns (final MPCState, stacked per-step (x, cost))."""
    state = mpc_init(model, params, cfg, dt, x0, u0)

    def body(s, _):
        s2 = mpc_step(model, params, cfg, dt, s)
        return s2, (s2.x, s2.plan.cost)

    return jax.lax.scan(body, state, None, length=n_steps)


# ---------------------------------------------------------------------------
# Fleet-scale MPC on the fused solver (thousands of controllers per chip)
# ---------------------------------------------------------------------------

def fleet_init(model: Model, params, cfg: SolverConfig, dt, x0s, u0):
    """Cold-plan a whole fleet with the fused batch solver.

    x0s (B, n); u0 (T, m) shared initial guess. Returns an MPCState whose
    leaves carry a leading fleet axis."""
    from ilqr_tpu.fused import solve_batch_fused

    sol = solve_batch_fused(model, params, cfg, dt, x0s, u0)
    B = x0s.shape[0]
    return MPCState(x=jnp.asarray(x0s, sol.us.dtype), plan=sol,
                    t=jnp.zeros((B,), jnp.int32))


@functools.lru_cache(maxsize=None)
def _get_plant_step(model: Model, cfg: SolverConfig):
    """Cached jitted fleet plant step (one compile per (model, cfg))."""
    integ = get_integrator(cfg.integrator)

    def one_plant(params, dt, x, u0_ff, K0, xref0):
        u = u0_ff + K0 @ (x - xref0)
        if cfg.clamp_forward:
            u = jnp.minimum(params.u_max, jnp.maximum(u, params.u_min))
        return integ(model, params, x, u, dt)

    return jax.jit(jax.vmap(one_plant,
                            in_axes=(None, None, 0, 0, 0, 0)))


def fleet_step(model: Model, params, cfg: SolverConfig, dt,
               state: MPCState, disturbance=None) -> MPCState:
    """One replanning cycle for the whole fleet: apply each controller's
    first control (+feedback), simulate, shift, warm-re-solve everything
    with one fused batch solve. Host-driven (don't jit-wrap — the fused
    solver manages its own compilation; see ilqr_tpu/fused.py)."""
    from ilqr_tpu.fused import solve_batch_fused_warm

    plan = state.plan
    x_next = _get_plant_step(model, cfg)(
        params, dt, state.x, plan.us[:, 0], plan.K[:, 0], plan.xs[:, 0])
    if disturbance is not None:
        x_next = x_next + disturbance

    shift = lambda a: jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)
    prev = plan._replace(us=shift(plan.us), xs=shift(plan.xs),
                         K=shift(plan.K))
    sol = solve_batch_fused_warm(model, params, cfg, dt, x_next, prev)
    return MPCState(x=x_next, plan=sol, t=state.t + 1)
