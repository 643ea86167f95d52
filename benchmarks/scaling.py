"""Scaling-efficiency benchmark: batched solves sharded over a device mesh.

Measures weak-scaling efficiency (fixed per-device batch, growing device
count) of the sharded solver — the multi-chip story (BASELINE.json target:
≥85% efficiency at 2+ hosts). Solves are embarrassingly parallel, so
efficiency loss can only come from GSPMD partitioning overhead and the
final stat reduction.

On real hardware this runs over the actual mesh; on CPU it uses virtual
devices, e.g.:

  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  JAX_PLATFORMS=cpu python benchmarks/scaling.py --per-device 32

Prints one JSON line per device count plus a summary efficiency figure.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-device", type=int, default=64,
                    help="batch per device (weak scaling)")
    ap.add_argument("--horizon", type=int, default=199)
    ap.add_argument("--max-iter", type=int, default=20)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--audit", action="store_true",
                    help="instead of weak-scaling timings: (a) time the "
                    "sharded solver against the unsharded vmap at EQUAL "
                    "total batch (isolates GSPMD/shard_map overhead from "
                    "core contention — virtual CPU devices share physical "
                    "cores, so raw weak scaling undershoots there), and "
                    "(b) count collectives in the compiled HLO to prove "
                    "the hot loop is communication-free")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from ilqr_tpu import SolverConfig, get_model
    from ilqr_tpu.models import acrobot as ac
    from ilqr_tpu.parallel.mesh import make_mesh, make_sharded_solver

    model = get_model("acrobot")
    params = ac.default_params()
    cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                       max_iter=args.max_iter)

    devices = jax.devices()
    rng = np.random.default_rng(0)

    if args.audit:
        nd = len(devices)
        B = args.per_device * nd
        x0 = jnp.asarray(0.05 * rng.normal(size=(B, 4)), jnp.float32)
        u0 = jnp.zeros((B, args.horizon, 1), jnp.float32)

        def timeit(fn):
            jax.block_until_ready(fn().cost)      # compile + warm
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(fn().cost)
                best = min(best, time.perf_counter() - t0)
            return best

        mesh = make_mesh(devices)
        sharded = make_sharded_solver(model, cfg, mesh=mesh)
        t_sharded = timeit(lambda: sharded(params, 0.02, x0, u0))

        from ilqr_tpu.solver import solve
        unsharded = jax.jit(jax.vmap(
            lambda x, u: solve(model, params, cfg, 0.02, x, u)))
        t_unsharded = timeit(lambda: unsharded(x0, u0))

        # Collective audit: the solves are independent, so the compiled
        # sharded program must contain NO collectives at all (stat
        # reductions live in sharded_convergence_stats, a separate program).
        hlo = sharded.jitted.lower(
            params, jnp.asarray(0.02), x0, u0).compile().as_text()
        colls = {op: hlo.count(op) for op in
                 ("all-reduce", "all-gather", "collective-permute",
                  "all-to-all", "reduce-scatter")}
        print(json.dumps({
            "audit": "sharded_vs_unsharded_equal_batch",
            "devices": nd, "physical_cores": os.cpu_count(),
            "batch": B, "horizon": args.horizon, "max_iter": args.max_iter,
            "sharded_s": round(t_sharded, 4),
            "unsharded_s": round(t_unsharded, 4),
            "partition_overhead": round(t_sharded / t_unsharded - 1.0, 4),
            "hot_program_collectives": colls,
            "collective_free": not any(colls.values()),
        }))
        return

    counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= len(devices)]
    results = []

    for nd in counts:
        mesh = make_mesh(devices[:nd])
        run = make_sharded_solver(model, cfg, mesh=mesh)
        B = args.per_device * nd
        x0 = jnp.asarray(0.05 * rng.normal(size=(B, 4)), jnp.float32)
        u0 = jnp.zeros((B, args.horizon, 1), jnp.float32)

        sol = run(params, 0.02, x0, u0)           # compile + warm
        jax.block_until_ready(sol.cost)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            sol = run(params, 0.02, x0, u0)
            jax.block_until_ready(sol.cost)
            times.append(time.perf_counter() - t0)
        best = min(times)
        rate = B / best
        results.append((nd, rate))
        print(json.dumps({
            "devices": nd, "batch": B, "seconds": round(best, 4),
            "solves_per_s": round(rate, 1),
        }))

    base_nd, base_rate = results[0]
    for nd, rate in results[1:]:
        eff = (rate / nd) / (base_rate / base_nd)
        print(json.dumps({
            "devices": nd,
            "weak_scaling_efficiency_vs_1dev": round(eff, 3),
        }))


if __name__ == "__main__":
    main()
