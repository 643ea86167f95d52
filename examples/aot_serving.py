"""Cold-start-free serving: precompile the solver once, then launch a
SolverService that answers its first request seconds after process start.

Phase 1 (--precompile): AOT-compile the batch solve at the service's
exact dispatch shape (max_batch x horizon) and save the executable blob.
On the TPU tunnel this pays the ~300 s lowering+compile tax ONCE
(BENCH_NOTES round 4: 293.9 s lower + 6.3 s compile, 49.5 MB blob).

Phase 2 (--serve): a fresh process loads the blob (~1.5 s), constructs
SolverService(aot=...), and serves immediately — no tracing, no compile.

  python examples/aot_serving.py --precompile [--cpu]
  python examples/aot_serving.py --serve [--cpu]
  python examples/aot_serving.py --precompile --serve [--cpu]   # both
  ... --warm        # the MPC deployment: warm-start program + replans
  ... --mesh N     # multi-device: compile+serve the SHARDED dispatch
                   # (shard_map over the first N devices; the blob bakes
                   # in the mesh topology and load() rebinds it)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--precompile", action="store_true")
    ap.add_argument("--serve", action="store_true")
    ap.add_argument("--blob", default="/tmp/ilqr_tpu_serve.aotexec")
    ap.add_argument("--model", default="double_integrator")
    ap.add_argument("--max-batch", type=int, default=64)
    ap.add_argument("--horizon", type=int, default=40)
    ap.add_argument("--max-iter", type=int, default=15)
    ap.add_argument("--requests", type=int, default=8)
    ap.add_argument("--path", default="auto",
                    choices=["auto", "fused", "vmap"])
    ap.add_argument("--warm", action="store_true",
                    help="compile/serve the MPC warm-start program and "
                         "chain replans through prev=")
    ap.add_argument("--mesh", type=int, default=0,
                    help="shard the dispatch over the first N devices "
                         "(compile_solver(mesh=) + SolverService(mesh=))")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if not (args.precompile or args.serve):
        ap.error("pass --precompile and/or --serve")

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from ilqr_tpu import SolverConfig, aot_compile, get_model
    from ilqr_tpu.serve import SolverService

    mesh = None
    if args.mesh:
        from ilqr_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(jax.devices()[:args.mesh])
        if args.max_batch % mesh.size:
            ap.error(f"--max-batch must be divisible by --mesh {mesh.size}")

    model = get_model(args.model)
    params = model.default_params()
    cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                       max_iter=args.max_iter)
    dt = 0.05
    path = args.path
    if path == "auto":
        path = ("fused" if jax.default_backend() == "tpu"
                and model.has_soa else "vmap")

    fields = (("us", "xs", "K", "lam", "dlam", "cost", "iterations")
              if args.warm else None)
    if args.precompile:
        t0 = time.perf_counter()
        solver = aot_compile(model, params, cfg, dt, args.max_batch,
                             args.horizon, path=path, warm=args.warm,
                             fields=fields, mesh=mesh)
        solver.save(args.blob)
        mb = os.path.getsize(args.blob) / 1e6
        kind = "warm" if args.warm else "cold"
        if mesh is not None:
            kind += f" sharded({mesh.size}dev)"
        print(f"precompiled {kind} [{path}] in "
              f"{time.perf_counter() - t0:.1f}s "
              f"-> {args.blob} ({mb:.1f} MB)")

    if args.serve:
        t0 = time.perf_counter()
        svc = SolverService(model, params, cfg, dt, args.horizon,
                            max_batch=args.max_batch, max_wait_ms=2.0,
                            path=path, warm=args.warm, fields=fields,
                            mesh=mesh, aot=args.blob)
        rng = np.random.default_rng(0)
        first = svc.solve(rng.normal(size=model.n).astype(np.float32),
                          timeout=600)
        t_first = time.perf_counter() - t0
        print(f"service cold-start -> first solution in {t_first:.2f}s "
              f"(cost {float(first.cost):.3f})")
        if args.warm:
            prev, costs = first, []
            for _ in range(args.requests):
                x0 = np.asarray(prev.xs[1], np.float32)
                prev = svc.solve(x0, prev=prev, timeout=600)
                costs.append(float(prev.cost))
            svc.close()
            print(f"chained {len(costs)} warm replans, final cost "
                  f"{costs[-1]:.3f}")
        else:
            futs = [svc.submit(rng.normal(size=model.n).astype(np.float32))
                    for _ in range(args.requests)]
            costs = [float(f.result(timeout=600).cost) for f in futs]
            svc.close()
            print(f"served {len(costs)} requests, mean cost "
                  f"{np.mean(costs):.3f}")


if __name__ == "__main__":
    main()
