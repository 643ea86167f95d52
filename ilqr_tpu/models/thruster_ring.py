"""Planar rigid body with a ring of 12 one-sided thrusters — the m=12
model (extra model; no reference counterpart, following the Model contract
of include/model.h:8-20).

  state   = [px, py, θ, vx, vy, ω]       (n = 6)
  control = u_0 … u_11, thrust in [0, f_max] each   (m = 12)

Twelve thrusters sit on a body-fixed ring at angles φ_i = 2πi/12:
even-indexed ones point radially inward (pure force through the center of
mass, zero torque), odd-indexed ones point tangentially with alternating
handedness (i ≡ 1 mod 4 spin +, i ≡ 3 mod 4 spin −), so both force
directions and both torque signs are reachable with one-sided actuators.
Body force rotates into the world frame through θ — the only nonlinearity,
giving fx live sin/cos entries.

Purpose: m = 12 exceeds the fused kernels' MAX_FUSED_M = 8
(ops/pallas_sweep.py), so this model exercises the OTHER TPU path — a
``vmap(solve)`` over the XLA scan backward with the fixed-shape
projected-Newton boxQP (``boxqp_mode="pn_fixed"``, ops/boxqp.boxqp_pn).
One-sided boxes + a linear fuel cost keep ~2/3 of the controls pinned at
their lower bound, so the QP's active-set machinery does real work every
timestep (like omni_thruster, but past the fused-m cap).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ilqr_tpu.models.base import Model

_M = 12
_RING_RADIUS = 0.5

# Body-frame thrust directions (12, 2) and torque arms (12,) from the ring
# geometry above — trace-time constants (numpy, converted at use to the
# input dtype so x64 runs don't get silently promoted f32 literals).
_DIRS = np.zeros((_M, 2))
_TORQUE = np.zeros((_M,))
for _i in range(_M):
    _phi = 2.0 * math.pi * _i / _M
    if _i % 2 == 0:                       # radial, inward: force only
        _DIRS[_i] = (-math.cos(_phi), -math.sin(_phi))
        _TORQUE[_i] = 0.0
    else:                                 # tangential: force + torque
        _s = 1.0 if _i % 4 == 1 else -1.0
        _DIRS[_i] = (-_s * math.sin(_phi), _s * math.cos(_phi))
        _TORQUE[_i] = _s * _RING_RADIUS
del _i, _phi, _s


class ThrusterRingParams(NamedTuple):
    goal: jnp.ndarray       # (6,) [px, py, θ, vx, vy, ω]
    mass: jnp.ndarray       # scalar
    inertia: jnp.ndarray    # scalar
    drag: jnp.ndarray       # scalar linear translational drag
    drag_w: jnp.ndarray     # scalar linear rotational drag
    w_state: jnp.ndarray    # (6,) running weights
    w_control: jnp.ndarray  # (12,) quadratic control weights
    w_fuel: jnp.ndarray     # scalar linear fuel cost per unit thrust
    w_final: jnp.ndarray    # (6,)
    u_min: jnp.ndarray      # (12,) zeros — thrusters are one-sided
    u_max: jnp.ndarray      # (12,)


def default_params(goal=(1.5, -1.0, 0.8, 0.0, 0.0, 0.0)) -> ThrusterRingParams:
    return ThrusterRingParams(
        goal=jnp.asarray(goal, dtype=jnp.result_type(float)),
        mass=jnp.asarray(1.0),
        inertia=jnp.asarray(0.1),
        drag=jnp.asarray(0.1),
        drag_w=jnp.asarray(0.05),
        w_state=jnp.asarray([0.5, 0.5, 0.5, 0.05, 0.05, 0.05]),
        w_control=jnp.asarray([0.02] * _M),
        w_fuel=jnp.asarray(0.05),
        w_final=jnp.asarray([200.0, 200.0, 200.0, 20.0, 20.0, 20.0]),
        u_min=jnp.zeros(_M),
        u_max=jnp.asarray([8.0] * _M),
    )


def dynamics(p: ThrusterRingParams, x, u):
    dirs = jnp.asarray(_DIRS, x.dtype)
    arms = jnp.asarray(_TORQUE, x.dtype)
    fb = dirs.T @ u                              # (2,) body-frame force
    ct, st = jnp.cos(x[2]), jnp.sin(x[2])
    inv_m = 1.0 / p.mass
    ax = (ct * fb[0] - st * fb[1]) * inv_m - p.drag * x[3]
    ay = (st * fb[0] + ct * fb[1]) * inv_m - p.drag * x[4]
    aw = (arms @ u) / p.inertia - p.drag_w * x[5]
    return jnp.stack([x[3], x[4], x[5], ax, ay, aw])


def cost(p: ThrusterRingParams, x, u):
    e = p.goal - x
    return (jnp.dot(e * p.w_state, e) + jnp.dot(u * p.w_control, u)
            + p.w_fuel * jnp.sum(u))


def final_cost(p: ThrusterRingParams, x):
    e = p.goal - x
    return jnp.dot(e * p.w_final, e)


MODEL = Model(
    name="thruster_ring",
    n=6,
    m=_M,
    dynamics=dynamics,
    cost=cost,
    final_cost=final_cost,
    default_params=default_params,
)
