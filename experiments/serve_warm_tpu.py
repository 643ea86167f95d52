"""TPU measurement of warm-started serving (MPC-as-a-service).

One warm SolverService (acrobot T=199, <=10 iters, max_batch=256,
fields sized to the warm-restart payload), then:
  1. single-controller chain: N sequential replans, each warm-started
     from the previous reply with a drifting x0 — the per-replan
     latency an MPC client actually sees;
  2. concurrent warm fleet: FLEET controllers × STEPS replans, each
     chaining its own prev — coalesced warm batches under load.

Cold lanes are bit-identical to the cold program (tests/test_serve.py),
so one compiled program serves the whole lifecycle.
"""

import json
import os
import sys
import time

import numpy as np

T, MAX_ITER = 199, 10
MAX_BATCH = int(os.environ.get("SW_MAX_BATCH", "256"))
CHAIN = int(os.environ.get("SW_CHAIN", "50"))
FLEET = int(os.environ.get("SW_FLEET", "32"))
STEPS = int(os.environ.get("SW_STEPS", "10"))


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    a = jnp.ones((256, 256), jnp.float32)
    (a @ a).block_until_ready()
    print(f"[serve_warm] health {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)

    from ilqr_tpu import SolverConfig, get_model
    from ilqr_tpu.models import acrobot as ac
    from ilqr_tpu.serve import SolverService

    model = get_model("acrobot")
    params = ac.default_params()
    cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                       max_iter=MAX_ITER)
    svc = SolverService(
        model, params, cfg, dt=0.02, horizon=T, max_batch=MAX_BATCH,
        max_wait_ms=2.0, path="fused", warm=True,
        fields=("us", "xs", "K", "lam", "dlam", "cost", "iterations"))
    rng = np.random.default_rng(3)

    t0 = time.perf_counter()
    sol = svc.solve(0.05 * rng.normal(size=4).astype(np.float32),
                    timeout=1800)
    warm_compile_s = time.perf_counter() - t0
    print(f"[serve_warm] compile+first {warm_compile_s:.1f}s",
          file=sys.stderr, flush=True)

    # ---- 1. single-controller warm chain -----------------------------
    x0 = 0.05 * rng.normal(size=4).astype(np.float32)
    prev = svc.solve(x0, timeout=600)          # cold lane
    lats, iters = [], []
    for _ in range(CHAIN):
        x0 = (np.asarray(prev.xs[1], np.float32)
              + 0.002 * rng.normal(size=4).astype(np.float32))
        t1 = time.perf_counter()
        prev = svc.solve(x0, prev=prev, timeout=600)
        lats.append(time.perf_counter() - t1)
        iters.append(int(prev.iterations))
    lats_ms = np.sort(np.asarray(lats)) * 1e3

    # ---- 2. concurrent warm fleet ------------------------------------
    import threading

    fleet_lats, flock = [], threading.Lock()

    def controller(i):
        crng = np.random.default_rng(500 + i)
        x = 0.05 * crng.normal(size=4).astype(np.float32)
        p = svc.solve(x, timeout=600)  # cold lane
        for _ in range(STEPS):
            x = (np.asarray(p.xs[1], np.float32)
                 + 0.002 * crng.normal(size=4).astype(np.float32))
            t1 = time.perf_counter()
            p = svc.solve(x, prev=p, timeout=600)
            with flock:
                fleet_lats.append(time.perf_counter() - t1)

    threads = [threading.Thread(target=controller, args=(i,))
               for i in range(FLEET)]
    t_f = time.perf_counter()
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    fleet_wall = time.perf_counter() - t_f
    fl_ms = np.sort(np.asarray(fleet_lats)) * 1e3

    svc.close(timeout=60)
    print(json.dumps({
        "mode": "serve_warm_mpc", "T": T, "max_iter": MAX_ITER,
        "max_batch": MAX_BATCH, "compile_s": round(warm_compile_s, 1),
        "chain_n": CHAIN,
        "chain_ms_p50": round(float(np.percentile(lats_ms, 50)), 1),
        "chain_ms_p90": round(float(np.percentile(lats_ms, 90)), 1),
        "chain_ms_best": round(float(lats_ms[0]), 1),
        "chain_mean_iters": round(float(np.mean(iters)), 2),
        "fleet": FLEET, "fleet_steps": STEPS,
        "fleet_wall_s": round(fleet_wall, 2),
        "fleet_replans_per_s": round(len(fleet_lats) / fleet_wall, 1),
        "fleet_ms_p50": round(float(np.percentile(fl_ms, 50)), 1),
        "fleet_ms_p99": round(float(np.percentile(fl_ms, 99)), 1),
    }), flush=True)


if __name__ == "__main__":
    main()
