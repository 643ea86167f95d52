"""TPU measurement of SolverService (VERDICT r3 item 2).

One process, one program (axon discipline): construct the service on the
fused path at the MPC serving shape (acrobot, T=199, <=10 iters), warm it
with a single request (pays the remote compile), then drive concurrent
load — SERVE_CLIENTS client threads, Poisson arrivals at SERVE_RATE_HZ
per client — and report throughput, the request-latency histogram
(p50/p90/p99), and the coalescing stats (lanes/batch, batches/s). The
claim under test (serve.py:5-18): batching amortizes the ~26 ms host
dispatch floor and the block-invariant device time, so per-request
latency stays near the SINGLE-solve latency while aggregate throughput
scales with the arrival rate.

Also measures the unloaded single-request latency before and after the
load phase (the amortization baseline).
"""

import json
import os
import sys
import threading
import time

import numpy as np

CLIENTS = int(os.environ.get("SERVE_CLIENTS", "64"))
REQS = int(os.environ.get("SERVE_REQS", "40"))       # per client
RATE_HZ = float(os.environ.get("SERVE_RATE_HZ", "8"))  # per client
WAIT_MS = float(os.environ.get("SERVE_WAIT_MS", "5"))
OPEN_LOOP = os.environ.get("SERVE_OPEN", "0") == "1"  # fire-and-collect:
# clients submit on their Poisson schedule WITHOUT waiting for results,
# so coalescing can fill batches toward the offered rate (the closed-
# loop default caps in-flight at CLIENTS and lanes/batch at ~CLIENTS/2)
T = int(os.environ.get("SERVE_T", "199"))
MAX_ITER = int(os.environ.get("SERVE_MAX_ITER", "10"))
PATH = os.environ.get("SERVE_PATH", "fused")  # 'vmap' for CPU dry runs
MAX_BATCH = int(os.environ.get("SERVE_MAX_BATCH", "1024"))
FIELDS = tuple(f for f in os.environ.get("SERVE_FIELDS", "").split(",")
               if f) or None  # e.g. "us,cost,iterations"


def main():
    t0 = time.perf_counter()
    import jax
    import jax.numpy as jnp

    a = jnp.ones((256, 256), jnp.float32)
    (a @ a).block_until_ready()
    print(f"[serve] health {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)

    from ilqr_tpu import SolverConfig, get_model
    from ilqr_tpu.models import acrobot as ac
    from ilqr_tpu.serve import SolverService

    model = get_model("acrobot")
    params = ac.default_params()
    cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                       max_iter=MAX_ITER)

    svc = SolverService(model, params, cfg, dt=0.02, horizon=T,
                        max_batch=MAX_BATCH, max_wait_ms=WAIT_MS, path=PATH,
                        fields=FIELDS)
    rng = np.random.default_rng(0)

    # ---- warm: one request pays the compile --------------------------
    t0 = time.perf_counter()
    sol = svc.solve(0.05 * rng.normal(size=4).astype(np.float32),
                    timeout=1800)
    warm_s = time.perf_counter() - t0
    assert np.isfinite(float(sol.cost))
    print(f"[serve] warm (compile+first) {warm_s:.1f}s", file=sys.stderr,
          flush=True)

    # ---- unloaded single-request latency -----------------------------
    def single_lat(n=8):
        lats = []
        for _ in range(n):
            x0 = 0.05 * rng.normal(size=4).astype(np.float32)
            t1 = time.perf_counter()
            svc.solve(x0, timeout=300)
            lats.append(time.perf_counter() - t1)
        return lats

    unloaded = single_lat()

    # ---- concurrent Poisson load -------------------------------------
    base = dict(svc.stats)
    lat_lock = threading.Lock()
    lats = []
    errors = []

    def _record(t1, fut, timeout=0):
        # timeout=0 on the open-loop callback path (the future is already
        # resolved when add_done_callback fires); closed loop blocks.
        try:
            s = fut.result(timeout=timeout)
            dt_req = time.perf_counter() - t1
            ok = np.isfinite(float(s.cost))
        except Exception as e:  # noqa: BLE001 — recorded, not raised
            with lat_lock:
                errors.append(repr(e))
            return
        with lat_lock:
            lats.append(dt_req)
            if not ok:
                errors.append("non-finite cost")

    open_futs = []

    def client(i):
        crng = np.random.default_rng(1000 + i)
        for _ in range(REQS):
            time.sleep(float(crng.exponential(1.0 / RATE_HZ)))
            x0 = 0.05 * crng.normal(size=4).astype(np.float32)
            t1 = time.perf_counter()
            if OPEN_LOOP:
                fut = svc.submit(x0)
                fut.add_done_callback(
                    lambda f, t1=t1: _record(t1, f))
                with lat_lock:
                    open_futs.append(fut)
            else:
                _record(t1, svc.submit(x0), timeout=600)

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(CLIENTS)]
    t_load = time.perf_counter()
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    if OPEN_LOOP:
        for f in open_futs:
            try:
                f.result(timeout=600)
            except Exception:  # noqa: BLE001 — already recorded
                pass
    load_s = time.perf_counter() - t_load
    stats = {k: svc.stats[k] - base.get(k, 0) for k in
             ("requests", "batches", "lanes", "solve_s")}

    loaded_single = single_lat()
    svc.close(timeout=120)
    lats_ms = np.sort(np.asarray(lats)) * 1e3
    out = {
        "mode": os.environ.get("SERVE_TAG", f"serve_{svc.path}"),
        "model": "acrobot", "T": T,
        "max_iter": MAX_ITER, "clients": CLIENTS, "reqs_per_client": REQS,
        "rate_hz_per_client": RATE_HZ, "max_wait_ms": WAIT_MS,
        "max_batch": MAX_BATCH, "fields": list(FIELDS) if FIELDS else None,
        "warm_s": round(warm_s, 1),
        "requests": int(stats["requests"]),
        "errors": len(errors),
        "throughput_req_s": round(len(lats) / load_s, 1),
        "batches": int(stats["batches"]),
        "batches_per_s": round(stats["batches"] / load_s, 2),
        "mean_lanes_per_batch": round(stats["lanes"]
                                      / max(stats["batches"], 1), 1),
        "device_solve_s_total": round(stats["solve_s"], 2),
        "load_wall_s": round(load_s, 2),
        "lat_ms_p50": round(float(np.percentile(lats_ms, 50)), 1),
        "lat_ms_p90": round(float(np.percentile(lats_ms, 90)), 1),
        "lat_ms_p99": round(float(np.percentile(lats_ms, 99)), 1),
        "lat_ms_max": round(float(lats_ms[-1]), 1),
        "single_ms_unloaded": round(1e3 * float(np.median(unloaded)), 1),
        "single_ms_post": round(1e3 * float(np.median(loaded_single)), 1),
    }
    if errors:
        out["first_error"] = errors[0]
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
