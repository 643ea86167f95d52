"""Omnidirectional 6-thruster craft — the m=6 model (extra model; no
reference counterpart, following the Model contract of
include/model.h:8-20).

  state   = [px, py, pz, vx, vy, vz]                 (n = 6)
  control = [f+x, f−x, f+y, f−y, f+z, f−z]           (m = 6)

  ṗ = v        v̇_a = (f+a − f−a)/mass − drag·|v_a|·v_a − g·δ_{a,z}

Each thruster pushes ONE way with thrust in [0, f_max] — an asymmetric
box whose lower bound is active on roughly half the controls at any
instant (a thruster never fires backwards), plus a linear fuel cost
w_fuel·Σu that pins idle thrusters exactly at 0. This is the workload for
the general-m (m > 4) in-kernel projected-Newton boxQP
(ops/pallas_sweep._qp_pn): persistent clamped sets, per-lane active-set
changes as the craft brakes, and gravity forcing the +z thruster to hover
against its upper range. The quadratic drag keeps fx state-dependent
(∂v̇_a/∂v_a = −2·drag·|v_a|).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ilqr_tpu.models.base import Model


class OmniThrusterParams(NamedTuple):
    goal: jnp.ndarray       # (6,) [px, py, pz, vx, vy, vz]
    mass: jnp.ndarray       # scalar
    drag: jnp.ndarray       # scalar quadratic drag coefficient
    gravity: jnp.ndarray    # scalar (positive; acts on −z)
    w_state: jnp.ndarray    # (6,) running weights
    w_control: jnp.ndarray  # (6,) quadratic control weights
    w_fuel: jnp.ndarray     # scalar linear fuel cost per unit thrust
    w_final: jnp.ndarray    # (6,)
    u_min: jnp.ndarray      # (6,) zeros — thrusters are one-sided
    u_max: jnp.ndarray      # (6,)


def default_params(goal=(2.0, -1.5, 1.0, 0.0, 0.0, 0.0)) -> OmniThrusterParams:
    return OmniThrusterParams(
        goal=jnp.asarray(goal, dtype=jnp.result_type(float)),
        mass=jnp.asarray(1.0),
        drag=jnp.asarray(0.05),
        gravity=jnp.asarray(9.81),
        w_state=jnp.asarray([0.5, 0.5, 0.5, 0.05, 0.05, 0.05]),
        w_control=jnp.asarray([0.02] * 6),
        w_fuel=jnp.asarray(0.05),
        w_final=jnp.asarray([200.0, 200.0, 200.0, 20.0, 20.0, 20.0]),
        u_min=jnp.zeros(6),
        u_max=jnp.asarray([15.0] * 6),
    )


def _accel(p: OmniThrusterParams, v, u_pos, u_neg, axis):
    inv_m = 1.0 / p.mass
    a = (u_pos - u_neg) * inv_m - p.drag * jnp.abs(v) * v
    if axis == 2:
        a = a - p.gravity
    return a


def dynamics(p: OmniThrusterParams, x, u):
    return jnp.stack([
        x[3],
        x[4],
        x[5],
        _accel(p, x[3], u[0], u[1], 0),
        _accel(p, x[4], u[2], u[3], 1),
        _accel(p, x[5], u[4], u[5], 2),
    ])


def cost(p: OmniThrusterParams, x, u):
    e = p.goal - x
    return (jnp.dot(e * p.w_state, e) + jnp.dot(u * p.w_control, u)
            + p.w_fuel * jnp.sum(u))


def final_cost(p: OmniThrusterParams, x):
    e = p.goal - x
    return jnp.dot(e * p.w_final, e)


def hover_control(p: OmniThrusterParams):
    """Thrusts that exactly cancel gravity at rest (the +z thruster
    carries m·g; everything else idles) — the canonical u0, since a
    zero-thrust initial rollout free-falls for the whole horizon."""
    return jnp.zeros(6).at[4].set(p.mass * p.gravity)


# --- SoA variants (elementwise only; (dims, *batch) layout) ---------------

def dynamics_soa(p: OmniThrusterParams, x, u):
    return jnp.stack([
        x[3],
        x[4],
        x[5],
        _accel(p, x[3], u[0], u[1], 0),
        _accel(p, x[4], u[2], u[3], 1),
        _accel(p, x[5], u[4], u[5], 2),
    ])


def cost_soa(p: OmniThrusterParams, x, u):
    acc = None
    for i in range(6):
        e = p.goal[i] - x[i]
        acc = e * p.w_state[i] * e if acc is None else acc + e * p.w_state[i] * e
    for j in range(6):
        acc = acc + u[j] * (p.w_control[j] * u[j] + p.w_fuel)
    return acc


def final_cost_soa(p: OmniThrusterParams, x):
    acc = None
    for i in range(6):
        e = p.goal[i] - x[i]
        acc = e * p.w_final[i] * e if acc is None else acc + e * p.w_final[i] * e
    return acc


def jac_soa(p: OmniThrusterParams, x, u):
    """Closed-form continuous-time Jacobians; structural zeros stay Python
    floats per the models/base.py contract (6 live A entries of 36, 6 of
    36 in B). d|v|·v/dv = 2|v|."""
    inv_m = 1.0 / p.mass
    A = [[0.0] * 6 for _ in range(6)]
    for a in range(3):
        A[a][3 + a] = 1.0
        A[3 + a][3 + a] = -2.0 * p.drag * jnp.abs(x[3 + a])
    B = [[0.0] * 6 for _ in range(6)]
    for a in range(3):
        B[3 + a][2 * a] = inv_m
        B[3 + a][2 * a + 1] = -inv_m
    return A, B


def cost_derivs_soa(p: OmniThrusterParams, x, u):
    cx = [-2.0 * p.w_state[i] * (p.goal[i] - x[i]) for i in range(6)]
    cu = [2.0 * p.w_control[j] * u[j] + p.w_fuel for j in range(6)]
    cxx = [[2.0 * p.w_state[i] if i == j else 0.0 for j in range(6)]
           for i in range(6)]
    cxu = [[0.0] * 6 for _ in range(6)]
    cuu = [[2.0 * p.w_control[i] if i == j else 0.0 for j in range(6)]
           for i in range(6)]
    return cx, cu, cxx, cxu, cuu


def final_cost_derivs_soa(p: OmniThrusterParams, x):
    cx = [-2.0 * p.w_final[i] * (p.goal[i] - x[i]) for i in range(6)]
    cxx = [[2.0 * p.w_final[i] if i == j else 0.0 for j in range(6)]
           for i in range(6)]
    return cx, cxx


MODEL = Model(
    name="omni_thruster",
    n=6,
    m=6,
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
