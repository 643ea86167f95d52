"""Per-problem batched params: a fleet of free-flyers docking at DIFFERENT
ports in one compiled solve.

Every problem in the batch has its own goal (docking port) and its own
thrust ceiling (degraded thrusters) — `params_batched=True` vmaps over the
params pytree itself, something the reference's virtual-dispatch models
(one goal baked into the object, include/model.h:17-18) structurally
cannot do. Uses the m=8 `free_flyer` (the fused solver's MAX_FUSED_M cap).

  python examples/free_flyer_docking.py --batch 256 [--cpu] [--vmap]
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
    from ilqr_tpu.models import free_flyer as ff

    model = get_model("free_flyer")
    cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                       max_iter=args.max_iter)

    B, T = args.batch, args.horizon
    rng = np.random.default_rng(0)

    # Per-problem params: docking ports on a ring, per-craft thrust limits.
    base = ff.default_params()
    theta = 2.0 * np.pi * rng.uniform(size=B)
    goals = np.zeros((B, 6), np.float32)
    goals[:, 0] = 2.0 * np.cos(theta)
    goals[:, 1] = 2.0 * np.sin(theta)
    goals[:, 2] = rng.uniform(-0.5, 0.5, size=B)
    fmax = rng.uniform(2.5, 4.0, size=B).astype(np.float32)  # degraded units
    params = jax.tree_util.tree_map(
        lambda leaf: jnp.broadcast_to(jnp.asarray(leaf, jnp.float32)[None],
                                      (B,) + jnp.shape(leaf)),
        base)
    params = params._replace(
        goal=jnp.asarray(goals),
        u_max=jnp.broadcast_to(jnp.asarray(fmax)[:, None], (B, 8)))

    x0 = jnp.asarray(0.2 * rng.normal(size=(B, 6)), jnp.float32)
    u0 = jnp.zeros((T, 8), jnp.float32)  # microgravity coasting start

    use_vmap = args.vmap or jax.default_backend() != "tpu"
    if use_vmap:
        from ilqr_tpu.batch import solve_batch

        solver = lambda x: solve_batch(model, params, cfg, 0.05, x, u0,
                                       params_batched=True)
    else:
        from ilqr_tpu.fused import solve_batch_fused

        solver = lambda x: solve_batch_fused(model, params, cfg, 0.05, x,
                                             u0, params_batched=True)

    t0 = time.perf_counter()
    sol = solver(x0)
    np.asarray(sol.cost)
    print(f"first call (incl. compile): {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    sol = solver(jnp.asarray(0.2 * rng.normal(size=(B, 6)), jnp.float32))
    costs = np.asarray(sol.cost)
    dt_s = time.perf_counter() - t0
    us = np.asarray(sol.us)
    print(f"{B} solves in {dt_s:.3f}s -> {B / dt_s:.0f} solves/s "
          f"({'vmap' if use_vmap else 'fused'} path)")
    xf = np.asarray(sol.xs)[:, -1, :3]
    err = np.linalg.norm(xf - goals[:, :3], axis=1)
    print(f"mean cost {costs.mean():.2f}, mean iters "
          f"{float(np.asarray(sol.iterations).mean()):.1f}, "
          f"median docking error {np.median(err):.3f} m")
    # every craft respects ITS OWN thrust ceiling
    peak = us.max(axis=(1, 2))
    assert (peak <= fmax + 1e-4).all(), "per-problem u_max violated"
    print(f"per-craft peak thrust within own ceiling: "
          f"{(peak <= fmax + 1e-4).mean():.0%} "
          f"(ceilings {fmax.min():.2f}-{fmax.max():.2f})")


if __name__ == "__main__":
    main()
