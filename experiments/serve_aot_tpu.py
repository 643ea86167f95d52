"""TPU measurement of the AOT serving cold start (ilqr_tpu.aot +
SolverService(aot=...)).

Phase save (SA_MODE=save): aot_compile the fused acrobot solve at the
service dispatch shape (B=1024, T=199, <=10 iters) through the PACKAGE
API (ilqr_tpu.aot.compile_solver — the raw-API probe was
experiments/aot_probe.py), save the blob, run one solve, record the
per-lane costs for the load phase to cross-check.

Phase serve (SA_MODE=serve): a fresh process loads the blob into
SolverService(aot=...) and measures
  - process-start -> first solution latency (the cold-start claim:
    ~3.5 s instead of the ~300 s lowering tax),
  - bit-equality of the first solve's cost against the save phase,
  - a short closed-loop burst (64 in-flight requests) for loaded
    behavior with zero compiles.

One TPU process per phase (axon discipline).
"""

import json
import os
import sys
import time

import numpy as np

MODE = os.environ.get("SA_MODE", "save")
BLOB = os.environ.get("SA_BLOB", os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "serve_aot.aotexec"))
COSTS = BLOB + ".costs.npy"
B = int(os.environ.get("SA_B", "1024"))
T = int(os.environ.get("SA_T", "199"))
MAX_ITER = int(os.environ.get("SA_MAXIT", "10"))
BURST = int(os.environ.get("SA_BURST", "64"))
PATH = os.environ.get("SA_PATH", "fused")  # vmap for CPU smoke runs

_PROC_T0 = time.perf_counter()


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    a = jnp.ones((256, 256), jnp.float32)
    (a @ a).block_until_ready()
    print(f"[serve_aot] health {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)

    from ilqr_tpu import SolverConfig, get_model
    from ilqr_tpu.models import acrobot as ac

    model = get_model("acrobot")
    params = ac.default_params()
    cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                       max_iter=MAX_ITER)
    rng = np.random.default_rng(7)
    out = {"mode": f"serve_aot_{MODE}", "B": B, "T": T,
           "max_iter": MAX_ITER, "backend": jax.default_backend()}

    if MODE == "save":
        from ilqr_tpu.aot import compile_solver

        t0 = time.perf_counter()
        solver = compile_solver(model, params, cfg, 0.02, B, T,
                                path=PATH)
        out["compile_s"] = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        solver.save(BLOB)
        out["save_s"] = round(time.perf_counter() - t0, 2)
        out["blob_mb"] = round(os.path.getsize(BLOB) / 1e6, 2)
        x0 = jnp.asarray(0.05 * rng.normal(size=(B, 4)), jnp.float32)
        u0 = jnp.zeros((B, T, 1), jnp.float32)
        t0 = time.perf_counter()
        sol = solver(x0, u0)
        costs = np.asarray(sol.cost)
        out["first_exec_s"] = round(time.perf_counter() - t0, 2)
        out["mean_cost"] = round(float(costs.mean()), 4)
        np.save(COSTS, costs)
    else:
        from ilqr_tpu.serve import SolverService

        t0 = time.perf_counter()
        svc = SolverService(model, params, cfg, dt=0.02, horizon=T,
                            max_batch=B, max_wait_ms=2.0, path=PATH,
                            aot=BLOB)
        out["svc_construct_s"] = round(time.perf_counter() - t0, 2)
        # first request: same x0[0] draw as the save phase's lane 0
        x0_all = (0.05 * rng.normal(size=(B, 4))).astype(np.float32)
        t0 = time.perf_counter()
        first = svc.solve(x0_all[0], timeout=600)
        out["first_solution_s"] = round(time.perf_counter() - t0, 2)
        out["process_to_first_s"] = round(
            time.perf_counter() - _PROC_T0, 2)
        if os.path.exists(COSTS):
            saved = np.load(COSTS)
            out["cost_delta_vs_save"] = float(
                abs(float(first.cost) - saved[0]))
        # burst: BURST concurrent requests, zero compiles expected
        t0 = time.perf_counter()
        futs = [svc.submit(x0_all[1 + i]) for i in range(BURST)]
        costs = [float(f.result(timeout=600).cost) for f in futs]
        burst_s = time.perf_counter() - t0
        out["burst_n"] = BURST
        out["burst_s"] = round(burst_s, 3)
        out["burst_req_s"] = round(BURST / burst_s, 1)
        out["burst_batches"] = svc.stats["batches"] - 1
        out["mean_cost_burst"] = round(float(np.mean(costs)), 4)
        svc.close(timeout=60)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
