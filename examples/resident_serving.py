"""Device-resident MPC fleet serving: controller warm state lives in
device slots, so each replan request carries only (x0, slot) — ~20 bytes
of H2D payload instead of the ~15 KB warm pytree (round-5 measurement:
full-block warm dispatches are transfer-bound on the TPU tunnel, and the
client leaks host RSS per transferred byte — the resident layout fixes
both; see BENCH_NOTES round 5).

  python examples/resident_serving.py --controllers 64 --steps 5 [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--controllers", type=int, default=64)
    ap.add_argument("--steps", type=int, default=5,
                    help="replans per controller")
    ap.add_argument("--horizon", type=int, default=40)
    ap.add_argument("--max-batch", type=int, default=64)
    ap.add_argument("--max-iter", type=int, default=12)
    ap.add_argument("--model", default="double_integrator")
    ap.add_argument("--path", default="auto",
                    choices=["auto", "fused", "vmap"])
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from ilqr_tpu import SolverConfig, get_model
    from ilqr_tpu.serve import SolverService

    model = get_model(args.model)
    params = model.default_params()
    cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                       max_iter=args.max_iter)
    path = args.path
    if path == "auto":
        path = ("fused" if jax.default_backend() == "tpu"
                and model.has_soa else "vmap")
    dt = 0.05
    C = args.controllers

    with SolverService(model, params, cfg, dt, args.horizon,
                       max_batch=args.max_batch, max_wait_ms=2.0,
                       path=path, warm=True, resident_slots=C) as svc:
        rng = np.random.default_rng(0)
        x0s = rng.normal(size=(C, model.n)).astype(np.float32) * 0.3
        t0 = time.perf_counter()
        total = 0
        cold_iters = warm_iters = 0.0
        for step in range(args.steps):
            futs = [svc.submit(x0s[i], slot=i) for i in range(C)]
            sols = [f.result(timeout=600) for f in futs]
            total += len(sols)
            iters = float(np.mean([int(s.iterations) for s in sols]))
            if step == 0:
                cold_iters = iters
            else:
                warm_iters = iters
            # actuate: roll each controller one step along its plan
            for i, s in enumerate(sols):
                x0s[i] = np.asarray(
                    model.dynamics(params, x0s[i], s.us[0]),
                    np.float32) * dt + x0s[i]
        elapsed = time.perf_counter() - t0
        print(f"{total} replans across {C} resident controllers in "
              f"{elapsed:.2f}s ({total / elapsed:.1f} replans/s); "
              f"mean iters cold {cold_iters:.1f} -> warm {warm_iters:.1f}")
        assert warm_iters <= cold_iters


if __name__ == "__main__":
    main()
