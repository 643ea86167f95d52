"""Acrobot swing-up: the hard underactuated benchmark.

Lagrangian dynamics and costs match ref include/acrobot.h exactly:
  state = [θ1, θ2, θ̇1, θ̇2], θ1 from the down axis (up = π); control = torque
  on the second joint only.

  H(q)  inertia matrix            (:43-51)
  C(q,q̇) Coriolis matrix          (:53-61)  — NOTE: C(0,1) uses l2 where l1
          would be expected; the reference (and its source TGlad/ILQR) does
          this, and since l1=l2=1 it is numerically irrelevant. Replicated
          verbatim for parity.
  G(q)  gravity vector            (:63-70)
  q̈ = H(q)⁻¹ ([0, u] − C q̇ − G)   (:72-81)
  running cost: Ks=Kd=0, Kr=0.1 → (Kr²)·uᵀu (torque only)  (:83-92)
  final cost: Ks=Kd=20 → Ks²·‖q_err‖² + Kd²·‖q̇_err‖²        (:94-100)
  goal = [3.1415, 0, 0, 0] (:20-22), limits ±5 (:37)
  params I1=I2=l1=l2=m1=m2=1, lc=0.5, g=9.81 (:19-25)
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ilqr_tpu.models.base import Model


class AcrobotParams(NamedTuple):
    goal: jnp.ndarray   # (4,)
    inertia: jnp.ndarray  # (2,) [I1, I2]
    lengths: jnp.ndarray  # (2,) [l1, l2]
    masses: jnp.ndarray   # (2,) [m1, m2]
    lc: jnp.ndarray       # (2,) [lc1, lc2]
    gravity: jnp.ndarray  # scalar
    k_run: jnp.ndarray    # (3,) [Ks, Kd, Kr] running-cost gains
    k_final: jnp.ndarray  # (2,) [Ks, Kd] final-cost gains
    u_min: jnp.ndarray    # (1,)
    u_max: jnp.ndarray    # (1,)


def default_params(goal=(3.1415, 0.0, 0.0, 0.0)) -> AcrobotParams:
    return AcrobotParams(
        goal=jnp.asarray(goal, dtype=jnp.result_type(float)),
        inertia=jnp.asarray([1.0, 1.0]),
        lengths=jnp.asarray([1.0, 1.0]),
        masses=jnp.asarray([1.0, 1.0]),
        lc=jnp.asarray([0.5, 0.5]),
        gravity=jnp.asarray(9.81),
        k_run=jnp.asarray([0.0, 0.0, 0.1]),
        k_final=jnp.asarray([20.0, 20.0]),
        u_min=jnp.asarray([-5.0]),
        u_max=jnp.asarray([5.0]),
    )


def dynamics(p: AcrobotParams, x, u):
    i1, i2 = p.inertia[0], p.inertia[1]
    l1, l2 = p.lengths[0], p.lengths[1]
    m1, m2 = p.masses[0], p.masses[1]
    lc1, lc2 = p.lc[0], p.lc[1]
    g = p.gravity

    q, qdot = x[:2], x[2:]
    c2, s2 = jnp.cos(q[1]), jnp.sin(q[1])
    s1, s12 = jnp.sin(q[0]), jnp.sin(q[0] + q[1])

    h_off = i2 + m2 * l1 * lc2 * c2
    H = jnp.array([
        [i1 + i2 + m2 * l1 * l1 + 2.0 * m2 * l1 * lc2 * c2, h_off],
        [h_off, i2],
    ])
    # C(0,1) uses l2 (reference quirk, see module docstring).
    C = jnp.array([
        [-2.0 * m2 * l1 * lc2 * s2 * qdot[1], -m2 * l2 * lc2 * s2 * qdot[1]],
        [m2 * l1 * lc2 * s2 * qdot[0], 0.0],
    ])
    G = jnp.array([
        m1 * g * lc1 * s1 + m2 * g * (l1 * s1 + lc2 * s12),
        m2 * g * lc2 * s12,
    ])

    # torque enters the second joint only; built from u to keep its dtype
    tau = jnp.stack([jnp.zeros_like(u[0]), u[0]])
    # 2x2 solve instead of explicit inverse: same math, better conditioning.
    qddot = jnp.linalg.solve(H, tau - C @ qdot - G)
    return jnp.concatenate([qdot, qddot])


def cost(p: AcrobotParams, x, u):
    e = p.goal - x
    ks, kd, kr = p.k_run[0], p.k_run[1], p.k_run[2]
    return (
        ks * ks * jnp.dot(e[:2], e[:2])
        + kd * kd * jnp.dot(e[2:], e[2:])
        + kr * kr * jnp.dot(u, u)
    )


def final_cost(p: AcrobotParams, x):
    e = p.goal - x
    ks, kd = p.k_final[0], p.k_final[1]
    return ks * ks * jnp.dot(e[:2], e[:2]) + kd * kd * jnp.dot(e[2:], e[2:])


MODEL = Model(
    name="acrobot",
    n=4,
    m=1,
    dynamics=dynamics,
    cost=cost,
    final_cost=final_cost,
    default_params=default_params,
)
