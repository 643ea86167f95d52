"""Batched MPC fleet demo: thousands of receding-horizon controllers
stepping in lock-step on one chip (BASELINE.json "batched MPC" config).

  python examples/mpc_fleet.py --fleet 256 --steps 50 [--cpu]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fleet", type=int, default=256)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--horizon", type=int, default=60)
    ap.add_argument("--model", default="double_integrator")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from ilqr_tpu import SolverConfig, get_model
    from ilqr_tpu.mpc import mpc_init, mpc_step

    model = get_model(args.model)
    params = model.default_params()
    cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                       max_iter=25)
    dt = 0.05

    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.normal(size=(args.fleet, model.n)) * 0.4,
                      jnp.float32)
    u0 = jnp.zeros((args.horizon, model.m), jnp.float32)

    fleet_init = jax.jit(jax.vmap(
        functools.partial(mpc_init, model, params, cfg, dt, u0=u0)))
    fleet_step = jax.jit(jax.vmap(
        functools.partial(mpc_step, model, params, cfg, dt)))

    t0 = time.perf_counter()
    fleet = fleet_init(x0s)
    jax.block_until_ready(fleet.x)
    print(f"fleet of {args.fleet} planned cold in "
          f"{time.perf_counter() - t0:.2f}s "
          f"(mean cost {float(jnp.mean(fleet.plan.cost)):.4g})")

    t0 = time.perf_counter()
    for step in range(args.steps):
        fleet = fleet_step(fleet)
        if (step + 1) % 10 == 0:
            jax.block_until_ready(fleet.x)
            err = jnp.linalg.norm(fleet.x - params.goal[None], axis=-1)
            print(f"step {step + 1:3d}: mean |x-goal| = "
                  f"{float(jnp.mean(err)):.4f}, mean replan iters = "
                  f"{float(jnp.mean(fleet.plan.iterations)):.1f}")
    jax.block_until_ready(fleet.x)
    elapsed = time.perf_counter() - t0
    rate = args.fleet * args.steps / elapsed
    print(f"{args.steps} replanning cycles x {args.fleet} controllers in "
          f"{elapsed:.2f}s = {rate:.0f} replans/s")


if __name__ == "__main__":
    main()
