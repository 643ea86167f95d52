"""Free-flyer with 8 cube-corner thrusters — the m=8 model (extra model;
no reference counterpart, following the Model contract of
include/model.h:8-20).

An Astrobee-style cabin robot: translation-only rigid body in
microgravity with quadratic cabin-air drag, actuated by 8 one-sided
thrusters mounted on the cube corners, thruster j pushing along the unit
diagonal s_j/√3 with s_j ∈ {−1,+1}³ (all 8 sign patterns):

  state   = [px, py, pz, vx, vy, vz]      (n = 6)
  control = u_0..u_7, each in [0, f_max]  (m = 8)

  ṗ = v        v̇ = (1/√3·mass)·Σ_j s_j·u_j − drag·|v|⊙v

This is the workload that runs the fused solver at its m = 8 cap
(ops/pallas_sweep.MAX_FUSED_M): the in-kernel projected-Newton boxQP
(_qp_pn) gets a full 8×8 masked Cholesky, the thrust mixing matrix has a
5-dimensional null space (8 thrusters for 3 force DOF) that only the
quadratic control + linear fuel costs resolve, and in microgravity the
optimal policy leaves most thrusters pinned at exactly 0 (the linear
fuel term makes the lower bound active, not merely approached). The
quadratic drag keeps fx state-dependent (∂v̇_a/∂v_a = −2·drag·|v_a|).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

from ilqr_tpu.models.base import Model

# Thruster direction signs: columns of the 3×8 mixing matrix, thruster j
# at cube corner (±1, ±1, ±1); bit k of j gives the sign on axis k.
_SIGNS = tuple(
    tuple(1.0 if (j >> k) & 1 else -1.0 for k in range(3)) for j in range(8)
)
_INV_SQRT3 = 1.0 / math.sqrt(3.0)


class FreeFlyerParams(NamedTuple):
    goal: jnp.ndarray       # (6,) [px, py, pz, vx, vy, vz]
    mass: jnp.ndarray       # scalar
    drag: jnp.ndarray       # scalar quadratic drag coefficient
    w_state: jnp.ndarray    # (6,) running weights
    w_control: jnp.ndarray  # (8,) quadratic control weights
    w_fuel: jnp.ndarray     # scalar linear fuel cost per unit thrust
    w_final: jnp.ndarray    # (6,)
    u_min: jnp.ndarray      # (8,) zeros — thrusters are one-sided
    u_max: jnp.ndarray      # (8,)


def default_params(goal=(1.5, -1.0, 0.8, 0.0, 0.0, 0.0)) -> FreeFlyerParams:
    return FreeFlyerParams(
        goal=jnp.asarray(goal, dtype=jnp.result_type(float)),
        mass=jnp.asarray(4.0),
        drag=jnp.asarray(0.1),
        w_state=jnp.asarray([0.5, 0.5, 0.5, 0.05, 0.05, 0.05]),
        w_control=jnp.asarray([0.05] * 8),
        w_fuel=jnp.asarray(0.1),
        w_final=jnp.asarray([200.0, 200.0, 200.0, 20.0, 20.0, 20.0]),
        u_min=jnp.zeros(8),
        u_max=jnp.asarray([4.0] * 8),
    )


def _thrust_sum(u, axis):
    """Σ_j sign_j[axis]·u_j with Python-float signs (dtype-preserving)."""
    acc = None
    for j in range(8):
        term = _SIGNS[j][axis] * u[j]
        acc = term if acc is None else acc + term
    return acc


def _accel(p: FreeFlyerParams, v, u, axis):
    return (_INV_SQRT3 / p.mass) * _thrust_sum(u, axis) \
        - p.drag * jnp.abs(v) * v


def dynamics(p: FreeFlyerParams, x, u):
    return jnp.stack([
        x[3],
        x[4],
        x[5],
        _accel(p, x[3], u, 0),
        _accel(p, x[4], u, 1),
        _accel(p, x[5], u, 2),
    ])


def cost(p: FreeFlyerParams, x, u):
    e = p.goal - x
    return (jnp.dot(e * p.w_state, e) + jnp.dot(u * p.w_control, u)
            + p.w_fuel * jnp.sum(u))


def final_cost(p: FreeFlyerParams, x):
    e = p.goal - x
    return jnp.dot(e * p.w_final, e)


# --- SoA variants (elementwise only; (dims, *batch) layout) ---------------

def dynamics_soa(p: FreeFlyerParams, x, u):
    return jnp.stack([
        x[3],
        x[4],
        x[5],
        _accel(p, x[3], u, 0),
        _accel(p, x[4], u, 1),
        _accel(p, x[5], u, 2),
    ])


def cost_soa(p: FreeFlyerParams, x, u):
    acc = None
    for i in range(6):
        e = p.goal[i] - x[i]
        acc = e * p.w_state[i] * e if acc is None else acc + e * p.w_state[i] * e
    for j in range(8):
        acc = acc + u[j] * (p.w_control[j] * u[j] + p.w_fuel)
    return acc


def final_cost_soa(p: FreeFlyerParams, x):
    acc = None
    for i in range(6):
        e = p.goal[i] - x[i]
        acc = e * p.w_final[i] * e if acc is None else acc + e * p.w_final[i] * e
    return acc


def jac_soa(p: FreeFlyerParams, x, u):
    """Closed-form continuous-time Jacobians; structural zeros stay Python
    floats per the models/base.py contract. A has 6 live entries of 36;
    B's force block is the constant mixing matrix scaled by 1/(√3·mass)
    (24 live entries of 48). d|v|·v/dv = 2|v|."""
    A = [[0.0] * 6 for _ in range(6)]
    for a in range(3):
        A[a][3 + a] = 1.0
        A[3 + a][3 + a] = -2.0 * p.drag * jnp.abs(x[3 + a])
    scale = _INV_SQRT3 / p.mass
    B = [[0.0] * 8 for _ in range(6)]
    for a in range(3):
        for j in range(8):
            B[3 + a][j] = _SIGNS[j][a] * scale
    return A, B


def cost_derivs_soa(p: FreeFlyerParams, x, u):
    cx = [-2.0 * p.w_state[i] * (p.goal[i] - x[i]) for i in range(6)]
    cu = [2.0 * p.w_control[j] * u[j] + p.w_fuel for j in range(8)]
    cxx = [[2.0 * p.w_state[i] if i == j else 0.0 for j in range(6)]
           for i in range(6)]
    cxu = [[0.0] * 8 for _ in range(6)]
    cuu = [[2.0 * p.w_control[i] if i == j else 0.0 for j in range(8)]
           for i in range(8)]
    return cx, cu, cxx, cxu, cuu


def final_cost_derivs_soa(p: FreeFlyerParams, x):
    cx = [-2.0 * p.w_final[i] * (p.goal[i] - x[i]) for i in range(6)]
    cxx = [[2.0 * p.w_final[i] if i == j else 0.0 for j in range(6)]
           for i in range(6)]
    return cx, cxx


MODEL = Model(
    name="free_flyer",
    n=6,
    m=8,
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
