"""Closed-loop rollout and the batched line search.

The reference's forward pass (ref: src/ilqr_core.cpp:305-337) mutates the
trajectory in place mid-rollout and must restore it on rejection
(:215-219). Here the rollout is a pure ``lax.scan`` returning fresh arrays.

The reference's line search (ref: src/ilqr_core.cpp:184-226) is a serial
backtracking loop over 11 step sizes. Here ALL candidates are evaluated as one
vmapped rollout (leading dim 11 → one fused device step) and the first
acceptable candidate is selected — identical acceptance semantics, no serial
host loop.

Parity note: the reference does NOT clamp controls to the box during rollout
(ilqr_core.cpp:322-329, "This is the wrong way, but the only way that works
right now"). ``clamp=False`` reproduces that; ``clamp=True`` is the corrected
behavior.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ilqr_tpu.config import SolverConfig
from ilqr_tpu.models.base import Model, get_integrator


def rollout(model: Model, params, cfg: SolverConfig, dt, x0, u_ff, xs_ref, K):
    """Closed-loop rollout u_t = u_ff_t + K_t (x_t − x̄_t) (ref :314-332).

    Returns (xs, us, total_cost) where ``us`` are the controls actually
    applied (the reference stores them back into ``us`` in place, :323).
    """
    integ = get_integrator(cfg.integrator)

    def step(x, inp):
        u_ff_t, x_ref_t, k_mat = inp
        u = u_ff_t + k_mat @ (x - x_ref_t)
        if cfg.clamp_forward:
            u = jnp.minimum(params.u_max, jnp.maximum(u, params.u_min))
        c = model.cost(params, x, u)
        x_next = integ(model, params, x, u, dt)
        return x_next, (x_next, u, c)

    _xT, (xs_tail, us_new, costs) = lax.scan(step, x0, (u_ff, xs_ref[:-1], K))
    xs_new = jnp.concatenate([x0[None], xs_tail], axis=0)
    total = jnp.sum(costs) + model.final_cost(params, xs_new[-1])
    return xs_new, us_new, total


def open_loop_rollout(model: Model, params, cfg: SolverConfig, dt, x0, us):
    """Initial rollout with no feedback (ref init_traj, ilqr_core.cpp:20 —
    K is empty there so forward_pass degenerates to open loop)."""
    T, m = us.shape
    n = x0.shape[0]
    zero_K = jnp.zeros((T, m, n), x0.dtype)
    xs_ref = jnp.zeros((T + 1, n), x0.dtype)
    return rollout(model, params, cfg, dt, x0, us, xs_ref, zero_K)


class LineSearchResult(NamedTuple):
    xs: jnp.ndarray        # (T+1, n) trajectory of the chosen candidate
    us: jnp.ndarray        # (T, m)
    cost: jnp.ndarray      # scalar
    dcost: jnp.ndarray     # actual cost reduction of the chosen candidate
    expected: jnp.ndarray  # expected reduction −α(dV₀+α·dV₁)
    z: jnp.ndarray         # dcost/expected ratio
    alpha: jnp.ndarray     # chosen step size (0.0 = all rejected, ref :224)
    accepted: jnp.ndarray  # bool


def line_search(
    model: Model, params, cfg: SolverConfig, dt, x0, xs, us, k, K, dV, cost_s
) -> LineSearchResult:
    """All-α batched line search (ref: src/ilqr_core.cpp:184-226).

    Acceptance: z = dcost/expected > z_min where expected = −α(dV₀+α·dV₁);
    when expected ≤ 0, z = sign(dcost) (ref :199-213 incl. the warning case).
    The first (largest-α) acceptable candidate wins, exactly like the serial
    backtracking order.
    """
    dtype = x0.dtype
    alphas = jnp.asarray(cfg.alphas, dtype)

    def try_alpha(alpha):
        u_ff = us + alpha * k
        xs_new, us_new, new_cost = rollout(
            model, params, cfg, dt, x0, u_ff, xs_ref=xs, K=K
        )
        dcost = cost_s - new_cost
        expected = -alpha * (dV[0] + alpha * dV[1])
        z = jnp.where(expected > 0, dcost / expected, jnp.sign(dcost))
        return xs_new, us_new, new_cost, dcost, expected, z

    xs_all, us_all, costs, dcosts, expecteds, zs = jax.vmap(try_alpha)(alphas)

    accept = zs > cfg.z_min
    accepted = jnp.any(accept)
    idx = jnp.argmax(accept)  # index of the first True (largest α first)

    return LineSearchResult(
        xs=xs_all[idx],
        us=us_all[idx],
        cost=costs[idx],
        dcost=dcosts[idx],
        expected=expecteds[idx],
        z=zs[idx],
        alpha=jnp.where(accepted, alphas[idx], jnp.zeros((), dtype)),
        accepted=accepted,
    )
