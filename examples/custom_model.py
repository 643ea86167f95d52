"""Defining your own model — the user-extension point.

In the reference you subclass ``Model`` and override three virtuals
(ref: include/model.h:8-10). Here a model is three pure functions over a
params pytree plus static dims; registering it makes it available to the
CLI and ``get_model``. The optional SoA variants opt the model into the
fused Pallas rollout/derivative kernels (see models/base.py).

This example: a planar unicycle (Dubins car with velocity control)
driving to a pose.

  python examples/custom_model.py [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import NamedTuple

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from ilqr_tpu.models.base import Model


class UnicycleParams(NamedTuple):
    goal: jnp.ndarray       # (3,) [x, y, θ]
    w_pos: jnp.ndarray      # scalar
    w_theta: jnp.ndarray
    w_control: jnp.ndarray  # (2,) [v, ω] weights
    w_final: jnp.ndarray    # scalar multiplier on the state error
    u_min: jnp.ndarray      # (2,)
    u_max: jnp.ndarray      # (2,)


def default_params(goal=(2.0, 1.0, 0.0)) -> UnicycleParams:
    return UnicycleParams(
        goal=jnp.asarray(goal, dtype=jnp.result_type(float)),
        w_pos=jnp.asarray(1.0),
        w_theta=jnp.asarray(0.3),
        w_control=jnp.asarray([0.05, 0.05]),
        w_final=jnp.asarray(50.0),
        u_min=jnp.asarray([-1.0, -2.0]),
        u_max=jnp.asarray([2.0, 2.0]),
    )


def dynamics(p: UnicycleParams, x, u):
    # ẋ = v cosθ, ẏ = v sinθ, θ̇ = ω
    return jnp.stack([u[0] * jnp.cos(x[2]), u[0] * jnp.sin(x[2]), u[1]])


def _state_err(p, x):
    e = p.goal - x
    return (p.w_pos * (e[0] * e[0] + e[1] * e[1])
            + p.w_theta * e[2] * e[2])


def cost(p: UnicycleParams, x, u):
    return (_state_err(p, x)
            + p.w_control[0] * u[0] * u[0] + p.w_control[1] * u[1] * u[1])


def final_cost(p: UnicycleParams, x):
    return p.w_final * _state_err(p, x)


# The per-problem functions above already index only leading axes and use
# elementwise ops, so they double as their own SoA variants — the common
# case for models without matrix solves in the dynamics.
UNICYCLE = Model(
    name="unicycle",
    n=3,
    m=2,
    dynamics=dynamics,
    cost=cost,
    final_cost=final_cost,
    default_params=default_params,
    dynamics_soa=dynamics,
    cost_soa=cost,
    final_cost_soa=final_cost,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from ilqr_tpu import SolverConfig, solve
    from ilqr_tpu.models import register

    register(UNICYCLE)  # now get_model("unicycle") works everywhere

    p = default_params()
    cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True)
    sol = solve(UNICYCLE, p, cfg, 0.05, jnp.zeros(3), jnp.zeros((80, 2)))
    xf = sol.xs[-1]
    print(f"cost {float(sol.cost):.4f}  iters {int(sol.iterations)}  "
          f"final pose ({float(xf[0]):.3f}, {float(xf[1]):.3f}, "
          f"{float(xf[2]):.3f})  goal {tuple(map(float, p.goal))}")


if __name__ == "__main__":
    main()
