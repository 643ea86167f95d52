"""Cart-pole swing-up (extra model; no reference counterpart).

state = [p, θ, ṗ, θ̇] with θ from the down axis (up = π); control = cart force.
Standard frictionless cart-pole equations of motion:
  θ̈ = (g sinθ − cosθ·(u + m_p l θ̇² sinθ)/(m_c+m_p)) /
       (l·(4/3 − m_p cos²θ/(m_c+m_p)))
  p̈ = (u + m_p l (θ̇² sinθ − θ̈ cosθ)) / (m_c+m_p)
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ilqr_tpu.models.base import Model


class CartPoleParams(NamedTuple):
    goal: jnp.ndarray       # (4,)
    mass_cart: jnp.ndarray
    mass_pole: jnp.ndarray
    length: jnp.ndarray     # half pole length
    gravity: jnp.ndarray
    w_state: jnp.ndarray    # (4,)
    w_control: jnp.ndarray  # scalar
    w_final: jnp.ndarray    # (4,)
    u_min: jnp.ndarray      # (1,)
    u_max: jnp.ndarray      # (1,)


def default_params(goal=(0.0, 3.14159265, 0.0, 0.0)) -> CartPoleParams:
    return CartPoleParams(
        goal=jnp.asarray(goal, dtype=jnp.result_type(float)),
        mass_cart=jnp.asarray(1.0),
        mass_pole=jnp.asarray(0.1),
        length=jnp.asarray(0.5),
        gravity=jnp.asarray(9.81),
        w_state=jnp.asarray([0.1, 0.1, 0.01, 0.01]),
        w_control=jnp.asarray(0.01),
        w_final=jnp.asarray([10.0, 100.0, 10.0, 10.0]),
        u_min=jnp.asarray([-10.0]),
        u_max=jnp.asarray([10.0]),
    )


def dynamics(p: CartPoleParams, x, u):
    theta, pdot, thetadot = x[1], x[2], x[3]
    mt = p.mass_cart + p.mass_pole
    st, ct = jnp.sin(theta), jnp.cos(theta)
    # θ measured from the down axis → gravity term is −g·sinθ toward down.
    temp = (u[0] + p.mass_pole * p.length * thetadot * thetadot * st) / mt
    thetaddot = (-p.gravity * st - ct * temp) / (
        p.length * (4.0 / 3.0 - p.mass_pole * ct * ct / mt)
    )
    pddot = temp + p.mass_pole * p.length * thetaddot * ct / mt
    return jnp.array([pdot, thetadot, pddot, thetaddot])


def cost(p: CartPoleParams, x, u):
    e = p.goal - x
    return jnp.dot(e * p.w_state, e) + p.w_control * jnp.dot(u, u)


def final_cost(p: CartPoleParams, x):
    e = p.goal - x
    return jnp.dot(e * p.w_final, e)


def dynamics_soa(p: CartPoleParams, x, u):
    """SoA variant for the fused Pallas rollout kernel (see models/base.py)."""
    theta, pdot, thetadot = x[1], x[2], x[3]
    mt = p.mass_cart + p.mass_pole
    st = jnp.sin(theta)
    ct = jnp.cos(theta)
    temp = (u[0] + p.mass_pole * p.length * thetadot * thetadot * st) / mt
    thetaddot = (-p.gravity * st - ct * temp) / (
        p.length * (4.0 / 3.0 - p.mass_pole * ct * ct / mt)
    )
    pddot = temp + p.mass_pole * p.length * thetaddot * ct / mt
    return jnp.stack([pdot, thetadot, pddot, thetaddot])


def _werr(p, x, w):
    acc = None
    for i in range(4):
        e = p.goal[i] - x[i]
        term = w[i] * e * e
        acc = term if acc is None else acc + term
    return acc


def cost_soa(p: CartPoleParams, x, u):
    return _werr(p, x, p.w_state) + p.w_control * u[0] * u[0]


def final_cost_soa(p: CartPoleParams, x):
    return _werr(p, x, p.w_final)


def jac_soa(p: CartPoleParams, x, u):
    """Closed-form Jacobians of :func:`dynamics_soa` (see models/base.py).

    Only θ (x1) and θ̇ (x3) enter the accelerations, so columns 0 and 2
    are structural zeros (plain floats, folded out of the kernel trace).
    With N = −g·sinθ − cosθ·temp and D = l·(4/3 − k·cos²θ):
      ∂θ̈ = (∂N − θ̈·∂D)/D,   ∂p̈ = ∂temp + k·l·∂(θ̈·cosθ).
    One shared reciprocal per distinct denominator (mt, D) — divides are
    ~10× a multiply in the VPU lowering (BENCH_NOTES.md)."""
    theta, thetadot = x[1], x[3]
    mt = p.mass_cart + p.mass_pole
    rmt = 1.0 / mt
    k = p.mass_pole * rmt
    kl = k * p.length
    st = jnp.sin(theta)
    ct = jnp.cos(theta)
    temp = (u[0] + p.mass_pole * p.length * thetadot * thetadot * st) * rmt
    dtemp_dth = kl * thetadot * thetadot * ct
    dtemp_dw = 2.0 * kl * thetadot * st
    rD = 1.0 / (p.length * (4.0 / 3.0 - k * ct * ct))
    a2 = (-p.gravity * st - ct * temp) * rD          # θ̈
    dD_dth = 2.0 * p.length * k * ct * st
    dN_dth = -p.gravity * ct + st * temp - ct * dtemp_dth
    da2_dth = (dN_dth - a2 * dD_dth) * rD
    da2_dw = -ct * dtemp_dw * rD
    da2_du = -ct * rmt * rD
    da1_dth = dtemp_dth + kl * (da2_dth * ct - a2 * st)
    da1_dw = dtemp_dw + kl * ct * da2_dw
    da1_du = rmt + kl * ct * da2_du
    A = [[0.0, 0.0, 1.0, 0.0],
         [0.0, 0.0, 0.0, 1.0],
         [0.0, da1_dth, 0.0, da1_dw],
         [0.0, da2_dth, 0.0, da2_dw]]
    B = [[0.0], [0.0], [da1_du], [da2_du]]
    return A, B


def cost_derivs_soa(p: CartPoleParams, x, u):
    cx = [-2.0 * p.w_state[i] * (p.goal[i] - x[i]) for i in range(4)]
    cu = [2.0 * p.w_control * u[0]]
    cxx = [[2.0 * p.w_state[i] if i == j else 0.0 for j in range(4)]
           for i in range(4)]
    cxu = [[0.0], [0.0], [0.0], [0.0]]
    cuu = [[2.0 * p.w_control]]
    return cx, cu, cxx, cxu, cuu


def final_cost_derivs_soa(p: CartPoleParams, x):
    cx = [-2.0 * p.w_final[i] * (p.goal[i] - x[i]) for i in range(4)]
    cxx = [[2.0 * p.w_final[i] if i == j else 0.0 for j in range(4)]
           for i in range(4)]
    return cx, cxx


MODEL = Model(
    name="cartpole",
    n=4,
    m=1,
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
