"""2D double integrator: the easy convex-ish sanity model.

Math matches ref include/double_integrator.h exactly:
  state  = [x, y, vx, vy], control = [Fx, Fy]
  dx     = [vx, vy, Fx/m, Fy/m]                        (:29-37)
  cost   = (g-x)ᵀ Hx (g-x) + uᵀ Hu u,  Hx=diag(1,1,.2,.2), Hu=I  (:19-24,39-43)
  final  = (g-x)ᵀ (10·Hx) (g-x)                        (:45-48)
  limits = ±0.5, mass = 1                              (:25-26,51)
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ilqr_tpu.models.base import Model


class DoubleIntegratorParams(NamedTuple):
    goal: jnp.ndarray    # (4,)
    mass: jnp.ndarray    # scalar
    hx_diag: jnp.ndarray  # (4,) diagonal of Hx
    hu_diag: jnp.ndarray  # (2,) diagonal of Hu
    final_scale: jnp.ndarray  # scalar (10 in the reference)
    u_min: jnp.ndarray   # (2,)
    u_max: jnp.ndarray   # (2,)


def default_params(goal=(1.0, 0.5, 0.0, 0.0)) -> DoubleIntegratorParams:
    return DoubleIntegratorParams(
        goal=jnp.asarray(goal, dtype=jnp.result_type(float)),
        mass=jnp.asarray(1.0),
        hx_diag=jnp.asarray([1.0, 1.0, 0.2, 0.2]),
        hu_diag=jnp.asarray([1.0, 1.0]),
        final_scale=jnp.asarray(10.0),
        u_min=jnp.asarray([-0.5, -0.5]),
        u_max=jnp.asarray([0.5, 0.5]),
    )


def dynamics(p: DoubleIntegratorParams, x, u):
    return jnp.concatenate([x[2:4], u / p.mass])


def cost(p: DoubleIntegratorParams, x, u):
    e = p.goal - x
    return jnp.dot(e * p.hx_diag, e) + jnp.dot(u * p.hu_diag, u)


def final_cost(p: DoubleIntegratorParams, x):
    e = p.goal - x
    return p.final_scale * jnp.dot(e * p.hx_diag, e)


def dynamics_soa(p: DoubleIntegratorParams, x, u):
    """SoA variant for the fused Pallas rollout kernel (see models/base.py)."""
    return jnp.stack([x[2], x[3], u[0] / p.mass, u[1] / p.mass])


def _state_err_sq(p, x):
    acc = None
    for i in range(4):
        e = p.goal[i] - x[i]
        term = p.hx_diag[i] * e * e
        acc = term if acc is None else acc + term
    return acc


def cost_soa(p: DoubleIntegratorParams, x, u):
    return (_state_err_sq(p, x)
            + p.hu_diag[0] * u[0] * u[0] + p.hu_diag[1] * u[1] * u[1])


def final_cost_soa(p: DoubleIntegratorParams, x):
    return p.final_scale * _state_err_sq(p, x)


def jac_soa(p: DoubleIntegratorParams, x, u):
    """Closed-form Jacobians of :func:`dynamics_soa` (see models/base.py).
    Structural constants stay Python floats — the merged sweep kernel
    folds them out at trace time."""
    inv_m = 1.0 / p.mass
    A = [[0.0, 0.0, 1.0, 0.0],
         [0.0, 0.0, 0.0, 1.0],
         [0.0, 0.0, 0.0, 0.0],
         [0.0, 0.0, 0.0, 0.0]]
    B = [[0.0, 0.0], [0.0, 0.0], [inv_m, 0.0], [0.0, inv_m]]
    return A, B


def cost_derivs_soa(p: DoubleIntegratorParams, x, u):
    cx = [-2.0 * p.hx_diag[i] * (p.goal[i] - x[i]) for i in range(4)]
    cu = [2.0 * p.hu_diag[j] * u[j] for j in range(2)]
    cxx = [[2.0 * p.hx_diag[i] if i == j else 0.0 for j in range(4)]
           for i in range(4)]
    cxu = [[0.0, 0.0] for _ in range(4)]
    cuu = [[2.0 * p.hu_diag[i] if i == j else 0.0 for j in range(2)]
           for i in range(2)]
    return cx, cu, cxx, cxu, cuu


def final_cost_derivs_soa(p: DoubleIntegratorParams, x):
    fs = p.final_scale
    cx = [-2.0 * fs * p.hx_diag[i] * (p.goal[i] - x[i]) for i in range(4)]
    cxx = [[2.0 * fs * p.hx_diag[i] if i == j else 0.0 for j in range(4)]
           for i in range(4)]
    return cx, cxx


MODEL = Model(
    name="double_integrator",
    n=4,
    m=2,
    dynamics=dynamics,
    cost=cost,
    final_cost=final_cost,
    default_params=default_params,
    dynamics_soa=dynamics_soa,
    cost_soa=cost_soa,
    final_cost_soa=final_cost_soa,
    jac_soa=jac_soa,
    cost_derivs_soa=cost_derivs_soa,
    final_cost_derivs_soa=final_cost_derivs_soa,
)
