"""Kinematic bicycle (car) — m=2 driving workload (extra model; no
reference counterpart, following the Model contract of model.h:8-20).

  state   = [px, py, ψ (heading), v]          (n = 4)
  control = [a (accel), δ (steering angle)]   (m = 2)

  ṗx = v cos ψ      ṗy = v sin ψ
  ψ̇  = v tan δ / L   v̇ = a

Quadratic pose/speed tracking cost; the accel box is ASYMMETRIC
(braking stronger than throttle, u ∈ [-4, 2] m/s²) so the clamped-set
logic is exercised off-center at m=2, like the quadrotor does at m=4.
Heading error is plain quadratic (no wrap) so the analytic SoA
derivatives below are exact everywhere.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ilqr_tpu.models.base import Model


class BicycleParams(NamedTuple):
    goal: jnp.ndarray       # (4,) [px, py, ψ, v]
    wheelbase: jnp.ndarray  # scalar L
    w_state: jnp.ndarray    # (4,) running weights
    w_control: jnp.ndarray  # (2,)
    w_final: jnp.ndarray    # (4,)
    u_min: jnp.ndarray      # (2,) [a_min, δ_min]
    u_max: jnp.ndarray      # (2,)


def default_params(goal=(5.0, 2.0, 0.0, 0.0)) -> BicycleParams:
    return BicycleParams(
        goal=jnp.asarray(goal, dtype=jnp.result_type(float)),
        wheelbase=jnp.asarray(2.7),
        w_state=jnp.asarray([0.1, 0.1, 0.05, 0.05]),
        w_control=jnp.asarray([0.5, 2.0]),
        w_final=jnp.asarray([100.0, 100.0, 50.0, 50.0]),
        u_min=jnp.asarray([-4.0, -0.55]),
        u_max=jnp.asarray([2.0, 0.55]),
    )


def dynamics(p: BicycleParams, x, u):
    psi, v = x[2], x[3]
    return jnp.stack([
        v * jnp.cos(psi),
        v * jnp.sin(psi),
        v * jnp.tan(u[1]) / p.wheelbase,
        u[0] + 0.0 * v,
    ])


def cost(p: BicycleParams, x, u):
    e = p.goal - x
    return jnp.dot(e * p.w_state, e) + jnp.dot(u * p.w_control, u)


def final_cost(p: BicycleParams, x):
    e = p.goal - x
    return jnp.dot(e * p.w_final, e)


def dynamics_soa(p: BicycleParams, x, u):
    psi, v = x[2], x[3]
    inv_L = 1.0 / p.wheelbase
    return jnp.stack([
        v * jnp.cos(psi),
        v * jnp.sin(psi),
        v * jnp.tan(u[1]) * inv_L,
        u[0] + 0.0 * v,
    ])


def cost_soa(p: BicycleParams, x, u):
    acc = None
    for i in range(4):
        e = p.goal[i] - x[i]
        acc = e * p.w_state[i] * e if acc is None else acc + e * p.w_state[i] * e
    for j in range(2):
        acc = acc + u[j] * p.w_control[j] * u[j]
    return acc


def final_cost_soa(p: BicycleParams, x):
    acc = None
    for i in range(4):
        e = p.goal[i] - x[i]
        acc = e * p.w_final[i] * e if acc is None else acc + e * p.w_final[i] * e
    return acc


def jac_soa(p: BicycleParams, x, u):
    """Closed-form continuous-time Jacobians (models/base.py contract);
    structural zeros stay Python floats (6 live A entries of 16)."""
    psi, v = x[2], x[3]
    sp, cp = jnp.sin(psi), jnp.cos(psi)
    inv_L = 1.0 / p.wheelbase
    td = jnp.tan(u[1])
    sec2 = 1.0 + td * td
    A = [[0.0] * 4 for _ in range(4)]
    A[0][2] = -v * sp
    A[0][3] = cp
    A[1][2] = v * cp
    A[1][3] = sp
    A[2][3] = td * inv_L
    B = [[0.0] * 2 for _ in range(4)]
    B[2][1] = v * sec2 * inv_L
    B[3][0] = 1.0
    return A, B


def cost_derivs_soa(p: BicycleParams, x, u):
    cx = [-2.0 * p.w_state[i] * (p.goal[i] - x[i]) for i in range(4)]
    cu = [2.0 * p.w_control[j] * u[j] for j in range(2)]
    cxx = [[2.0 * p.w_state[i] if i == j else 0.0 for j in range(4)]
           for i in range(4)]
    cxu = [[0.0] * 2 for _ in range(4)]
    cuu = [[2.0 * p.w_control[i] if i == j else 0.0 for j in range(2)]
           for i in range(2)]
    return cx, cu, cxx, cxu, cuu


def final_cost_derivs_soa(p: BicycleParams, x):
    cx = [-2.0 * p.w_final[i] * (p.goal[i] - x[i]) for i in range(4)]
    cxx = [[2.0 * p.w_final[i] if i == j else 0.0 for j in range(4)]
           for i in range(4)]
    return cx, cxx


MODEL = Model(
    name="bicycle",
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
