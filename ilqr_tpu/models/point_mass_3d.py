"""3D point mass: the m=3 workload (triple-input double integrator).

The reference supports arbitrary control dimension through its generic
boxQP machinery (ref src/boxqp.cpp:26-139, include/boxqp.h:45-46); its two
shipped models stop at m=2. This model exercises m=3 end-to-end — in
particular the fused solver's in-kernel 27-candidate active-set QP
(ops/pallas_sweep._qp_m3).

  state  = [x, y, z, vx, vy, vz], control = [Fx, Fy, Fz]
  dx     = [v, F/m]                       (double_integrator.h:29-37 pattern)
  cost   = (g-x)ᵀ Hx (g-x) + uᵀ Hu u
  final  = final_scale · (g-x)ᵀ Hx (g-x)
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ilqr_tpu.models.base import Model


class PointMass3DParams(NamedTuple):
    goal: jnp.ndarray         # (6,)
    mass: jnp.ndarray         # scalar
    hx_diag: jnp.ndarray      # (6,) diagonal of Hx
    hu_diag: jnp.ndarray      # (3,) diagonal of Hu
    final_scale: jnp.ndarray  # scalar
    u_min: jnp.ndarray        # (3,)
    u_max: jnp.ndarray        # (3,)


def default_params(goal=(1.0, 0.5, -0.5, 0.0, 0.0, 0.0)) -> PointMass3DParams:
    return PointMass3DParams(
        goal=jnp.asarray(goal, dtype=jnp.result_type(float)),
        mass=jnp.asarray(1.0),
        hx_diag=jnp.asarray([1.0, 1.0, 1.0, 0.2, 0.2, 0.2]),
        hu_diag=jnp.asarray([1.0, 1.0, 1.0]),
        final_scale=jnp.asarray(10.0),
        u_min=jnp.asarray([-0.5, -0.5, -0.5]),
        u_max=jnp.asarray([0.5, 0.5, 0.5]),
    )


def dynamics(p: PointMass3DParams, x, u):
    return jnp.concatenate([x[3:], u / p.mass])


def cost(p: PointMass3DParams, x, u):
    e = p.goal - x
    return jnp.dot(e * p.hx_diag, e) + jnp.dot(u * p.hu_diag, u)


def final_cost(p: PointMass3DParams, x):
    e = p.goal - x
    return p.final_scale * jnp.dot(e * p.hx_diag, e)


def dynamics_soa(p: PointMass3DParams, x, u):
    inv_m = 1.0 / p.mass
    return jnp.stack([x[3], x[4], x[5],
                      u[0] * inv_m, u[1] * inv_m, u[2] * inv_m])


def cost_soa(p: PointMass3DParams, x, u):
    acc = (p.goal[0] - x[0]) * p.hx_diag[0] * (p.goal[0] - x[0])
    for i in range(1, 6):
        e = p.goal[i] - x[i]
        acc = acc + e * p.hx_diag[i] * e
    for j in range(3):
        acc = acc + u[j] * p.hu_diag[j] * u[j]
    return acc


def final_cost_soa(p: PointMass3DParams, x):
    acc = (p.goal[0] - x[0]) * p.hx_diag[0] * (p.goal[0] - x[0])
    for i in range(1, 6):
        e = p.goal[i] - x[i]
        acc = acc + e * p.hx_diag[i] * e
    return p.final_scale * acc


def jac_soa(p: PointMass3DParams, x, u):
    """Closed-form Jacobians of :func:`dynamics_soa` (see models/base.py).
    Structural constants stay Python floats — the merged sweep kernel
    folds them out at trace time (A has only 3 nonzeros of 36)."""
    inv_m = 1.0 / p.mass
    A = [[0.0] * 6 for _ in range(6)]
    for i in range(3):
        A[i][i + 3] = 1.0
    B = [[0.0] * 3 for _ in range(6)]
    for j in range(3):
        B[j + 3][j] = inv_m
    return A, B


def cost_derivs_soa(p: PointMass3DParams, x, u):
    cx = [-2.0 * p.hx_diag[i] * (p.goal[i] - x[i]) for i in range(6)]
    cu = [2.0 * p.hu_diag[j] * u[j] for j in range(3)]
    cxx = [[2.0 * p.hx_diag[i] if i == j else 0.0 for j in range(6)]
           for i in range(6)]
    cxu = [[0.0] * 3 for _ in range(6)]
    cuu = [[2.0 * p.hu_diag[i] if i == j else 0.0 for j in range(3)]
           for i in range(3)]
    return cx, cu, cxx, cxu, cuu


def final_cost_derivs_soa(p: PointMass3DParams, x):
    fs = p.final_scale
    cx = [-2.0 * fs * p.hx_diag[i] * (p.goal[i] - x[i]) for i in range(6)]
    cxx = [[2.0 * fs * p.hx_diag[i] if i == j else 0.0 for j in range(6)]
           for i in range(6)]
    return cx, cxx


MODEL = Model(
    name="point_mass_3d",
    n=6,
    m=3,
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
