"""TPU measurement: the COMPLETE production serving story in one probe.

Phase save (SWA_MODE=save): compile_solver(warm=True, fields=..., fused,
max_batch=256, T=199) — the exact warm MPC serving dispatch program —
and save the blob.

Phase serve (SWA_MODE=serve): a FRESH process constructs
SolverService(warm=True, fields=..., aot=blob) and measures
  - process start -> first served solution (cold lane, zero compiles),
  - a 30-step warm replan chain (per-replan latency),
  - a 16-controller concurrent warm fleet.

This exercises every serving feature at once: AOT cold start, warm
starts, field selection, packed single-transfer H2D+D2H.
"""

import json
import os
import sys
import time

import numpy as np

MODE = os.environ.get("SWA_MODE", "save")
BLOB = os.environ.get("SWA_BLOB", os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "serve_warm.aotexec"))
T, MAX_ITER, MB = 199, 10, 256
FIELDS = ("us", "xs", "K", "lam", "dlam", "cost", "iterations")

_PROC_T0 = time.perf_counter()


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    a = jnp.ones((256, 256), jnp.float32)
    (a @ a).block_until_ready()
    print(f"[swa] health {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)

    from ilqr_tpu import SolverConfig, get_model
    from ilqr_tpu.models import acrobot as ac

    model = get_model("acrobot")
    params = ac.default_params()
    cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                       max_iter=MAX_ITER)
    out = {"mode": f"serve_warm_aot_{MODE}", "T": T, "max_iter": MAX_ITER,
           "max_batch": MB, "backend": jax.default_backend()}

    if MODE == "save":
        from ilqr_tpu.aot import compile_solver

        t0 = time.perf_counter()
        solver = compile_solver(model, params, cfg, 0.02, MB, T,
                                path="fused", warm=True, fields=FIELDS)
        out["compile_s"] = round(time.perf_counter() - t0, 1)
        solver.save(BLOB)
        out["blob_mb"] = round(os.path.getsize(BLOB) / 1e6, 2)
    else:
        from ilqr_tpu.serve import SolverService

        t0 = time.perf_counter()
        svc = SolverService(model, params, cfg, dt=0.02, horizon=T,
                            max_batch=MB, max_wait_ms=2.0, path="fused",
                            warm=True, fields=FIELDS, aot=BLOB)
        out["svc_construct_s"] = round(time.perf_counter() - t0, 2)
        rng = np.random.default_rng(9)
        t0 = time.perf_counter()
        prev = svc.solve(0.05 * rng.normal(size=4).astype(np.float32),
                         timeout=600)
        out["first_solution_s"] = round(time.perf_counter() - t0, 2)
        out["process_to_first_s"] = round(
            time.perf_counter() - _PROC_T0, 2)

        lats = []
        for _ in range(30):
            x0 = (np.asarray(prev.xs[1], np.float32)
                  + 0.002 * rng.normal(size=4).astype(np.float32))
            t1 = time.perf_counter()
            prev = svc.solve(x0, prev=prev, timeout=600)
            lats.append(time.perf_counter() - t1)
        lms = np.sort(np.asarray(lats)) * 1e3
        out["chain_ms_p50"] = round(float(np.percentile(lms, 50)), 1)
        out["chain_ms_best"] = round(float(lms[0]), 1)

        import threading

        fl, lock = [], threading.Lock()

        def ctrl(i):
            crng = np.random.default_rng(700 + i)
            x = 0.05 * crng.normal(size=4).astype(np.float32)
            p = svc.solve(x, timeout=600)
            for _ in range(10):
                x = (np.asarray(p.xs[1], np.float32)
                     + 0.002 * crng.normal(size=4).astype(np.float32))
                t1 = time.perf_counter()
                p = svc.solve(x, prev=p, timeout=600)
                with lock:
                    fl.append(time.perf_counter() - t1)

        ths = [threading.Thread(target=ctrl, args=(i,)) for i in range(16)]
        t_f = time.perf_counter()
        for th in ths:
            th.start()
        for th in ths:
            th.join()
        wall = time.perf_counter() - t_f
        fms = np.sort(np.asarray(fl)) * 1e3
        out["fleet"] = 16
        out["fleet_replans_per_s"] = round(len(fl) / wall, 1)
        out["fleet_ms_p50"] = round(float(np.percentile(fms, 50)), 1)
        out["fleet_ms_p99"] = round(float(np.percentile(fms, 99)), 1)
        svc.close(timeout=60)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
