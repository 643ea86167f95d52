"""Torque-limited pendulum swing-up (extra model; no reference counterpart).

state = [θ, θ̇] with θ from the down axis (up = π); control = torque.
  θ̈ = (u − b·θ̇ − m·g·l·sin θ) / (m·l²)
Quadratic state+control running cost, scaled quadratic final cost.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ilqr_tpu.models.base import Model


class PendulumParams(NamedTuple):
    goal: jnp.ndarray      # (2,)
    mass: jnp.ndarray
    length: jnp.ndarray
    damping: jnp.ndarray
    gravity: jnp.ndarray
    w_state: jnp.ndarray   # (2,) running state weights
    w_control: jnp.ndarray  # scalar
    w_final: jnp.ndarray   # (2,) final state weights
    u_min: jnp.ndarray     # (1,)
    u_max: jnp.ndarray     # (1,)


def default_params(goal=(3.14159265, 0.0)) -> PendulumParams:
    return PendulumParams(
        goal=jnp.asarray(goal, dtype=jnp.result_type(float)),
        mass=jnp.asarray(1.0),
        length=jnp.asarray(1.0),
        damping=jnp.asarray(0.05),
        gravity=jnp.asarray(9.81),
        w_state=jnp.asarray([0.1, 0.01]),
        w_control=jnp.asarray(0.01),
        w_final=jnp.asarray([100.0, 10.0]),
        u_min=jnp.asarray([-2.5]),
        u_max=jnp.asarray([2.5]),
    )


def dynamics(p: PendulumParams, x, u):
    theta, thetadot = x[0], x[1]
    inertia = p.mass * p.length * p.length
    thetaddot = (
        u[0] - p.damping * thetadot - p.mass * p.gravity * p.length * jnp.sin(theta)
    ) / inertia
    return jnp.array([thetadot, thetaddot])


def cost(p: PendulumParams, x, u):
    e = p.goal - x
    return jnp.dot(e * p.w_state, e) + p.w_control * jnp.dot(u, u)


def final_cost(p: PendulumParams, x):
    e = p.goal - x
    return jnp.dot(e * p.w_final, e)


def dynamics_soa(p: PendulumParams, x, u):
    """SoA variant for the fused Pallas rollout kernel (see models/base.py)."""
    inertia = p.mass * p.length * p.length
    thetaddot = (
        u[0] - p.damping * x[1]
        - p.mass * p.gravity * p.length * jnp.sin(x[0])
    ) / inertia
    return jnp.stack([x[1], thetaddot])


def cost_soa(p: PendulumParams, x, u):
    e0 = p.goal[0] - x[0]
    e1 = p.goal[1] - x[1]
    return (p.w_state[0] * e0 * e0 + p.w_state[1] * e1 * e1
            + p.w_control * u[0] * u[0])


def final_cost_soa(p: PendulumParams, x):
    e0 = p.goal[0] - x[0]
    e1 = p.goal[1] - x[1]
    return p.w_final[0] * e0 * e0 + p.w_final[1] * e1 * e1


def jac_soa(p: PendulumParams, x, u):
    """Closed-form Jacobians of :func:`dynamics_soa` (see models/base.py).
    Structural constants stay Python floats — the merged sweep kernel
    folds them out at trace time."""
    inertia = p.mass * p.length * p.length
    a10 = -p.gravity / p.length * jnp.cos(x[0])
    a11 = -p.damping / inertia
    A = [[0.0, 1.0], [a10, a11]]
    B = [[0.0], [1.0 / inertia]]
    return A, B


def cost_derivs_soa(p: PendulumParams, x, u):
    cx = [-2.0 * p.w_state[i] * (p.goal[i] - x[i]) for i in range(2)]
    cu = [2.0 * p.w_control * u[0]]
    cxx = [[2.0 * p.w_state[i] if i == j else 0.0 for j in range(2)]
           for i in range(2)]
    cxu = [[0.0], [0.0]]
    cuu = [[2.0 * p.w_control]]
    return cx, cu, cxx, cxu, cuu


def final_cost_derivs_soa(p: PendulumParams, x):
    cx = [-2.0 * p.w_final[i] * (p.goal[i] - x[i]) for i in range(2)]
    cxx = [[2.0 * p.w_final[i] if i == j else 0.0 for j in range(2)]
           for i in range(2)]
    return cx, cxx


MODEL = Model(
    name="pendulum",
    n=2,
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
