"""Batched quadrotor waypoint solves — the m=4 workload end to end.

Solves B independent quadrotor trajectory-optimization problems (n=12
states, 4 per-rotor thrusts in an asymmetric [0, f_max] box) in one
batched call. On TPU the fused solver runs the whole iLQR loop in kernel
layout with the exact 81-candidate in-kernel box QP; pass --vmap for the
composable `vmap(solve)` path (the XLA leg, also the CPU default — the
fused solver's off-TPU interpret mode is far too slow for real sizes).

  python examples/quadrotor_waypoints.py --batch 256 [--cpu] [--vmap]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--horizon", type=int, default=80)
    ap.add_argument("--max-iter", type=int, default=40)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--vmap", action="store_true",
                    help="composable vmap(solve) path instead of fused")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from ilqr_tpu import SolverConfig, get_model
    from ilqr_tpu.models import quadrotor as qd

    model = get_model("quadrotor")
    params = qd.default_params()
    cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                       max_iter=args.max_iter)

    B, T = args.batch, args.horizon
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(0.1 * rng.normal(size=(B, 12)), jnp.float32)
    u0 = jnp.tile(qd.hover_control(params)[None].astype(jnp.float32),
                  (T, 1))

    use_vmap = args.vmap or jax.default_backend() != "tpu"
    if use_vmap:
        from ilqr_tpu.batch import solve_batch as run

        solver = lambda x: run(model, params, cfg, 0.02, x, u0)
    else:
        from ilqr_tpu.fused import solve_batch_fused

        solver = lambda x: solve_batch_fused(model, params, cfg, 0.02, x,
                                             u0)

    t0 = time.perf_counter()
    sol = solver(x0)
    np.asarray(sol.cost)
    print(f"first call (incl. compile): {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    sol = solver(jnp.asarray(0.1 * rng.normal(size=(B, 12)), jnp.float32))
    costs = np.asarray(sol.cost)
    dt_s = time.perf_counter() - t0
    us = np.asarray(sol.us)
    print(f"{B} solves in {dt_s:.3f}s -> {B / dt_s:.0f} solves/s "
          f"({'vmap' if use_vmap else 'fused'} path)")
    print(f"mean cost {costs.mean():.2f}, mean iters "
          f"{float(np.asarray(sol.iterations).mean()):.1f}, thrust range "
          f"[{us.min():.3f}, {us.max():.3f}] (box [0, 3])")
    xf = np.asarray(sol.xs)[:, -1, :3]
    goal = np.asarray(params.goal[:3])
    print(f"median final position error "
          f"{np.median(np.linalg.norm(xf - goal, axis=1)):.3f} m")


if __name__ == "__main__":
    main()
