"""Full-block warm-serving soak (VERDICT r4 item 4): retire the last
extrapolation in the serving story by MEASURING sustained 1024-lane
warm MPC serving over >=10k replans, with RSS tracking.

Phase save (SS_MODE=save): compile_solver(warm=True, fields=..., batch
=1024, horizon=199, max_iter<=10) -> serve_warm1024.aotexec (pay the
~300 s lowering tax once; the soak process then never compiles).

Phase soak (SS_MODE=soak): load the blob into SolverService(warm=True,
aot=..., max_batch=1024), run SS_CONTROLLERS (default 2048) simulated
MPC controllers EVENT-DRIVEN (each future's done-callback immediately
resubmits that controller's next replan warm-started from the returned
Solution — no thread army), for SS_SECONDS (default 90) of steady
state. Records replans/s, latency p50/p99, lanes/batch, and VmRSS
samples (start/steady/end) — the round-4 "~3,400 req/s per-chip
capacity" claim was extrapolated from 107-lane batches; this measures
full blocks under sustained load.

Phase resident (SS_MODE=resident): the round-5 DEVICE-RESIDENT fleet
(SolverService(resident_slots=...)): same controller fleet, but each
replan submits only (x0, slot) — the warm pytree never leaves the
device. Compiles in-process (~300 s — no AOT for the donated-state
program yet), then runs the same soak loop. Expected vs the prev= soak:
higher replans/s (the 15 MB/dispatch H2D payload drops to ~20 KB) and
near-flat RSS (the axon client leaks per transfer BYTE — rss_probe2).
"""

import json
import os
import sys
import threading
import time

import numpy as np

MODE = os.environ.get("SS_MODE", "save")
BLOB = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "serve_warm1024.aotexec")
RES_BLOB = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "serve_resident1024.aotexec")
PROC_T0 = time.perf_counter()
B_MAX, T, MAX_ITER = 1024, 199, 10
CONTROLLERS = int(os.environ.get("SS_CONTROLLERS", "2048"))
SOAK_S = float(os.environ.get("SS_SECONDS", "90"))
MIN_REPLANS = int(os.environ.get("SS_MIN_REPLANS", "10000"))
FIELDS = ("us", "xs", "K", "lam", "dlam", "cost", "iterations")


def rss_mb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return round(int(line.split()[1]) / 1024.0, 1)
    return -1.0


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    a = jnp.ones((256, 256), jnp.float32)
    (a @ a).block_until_ready()
    print(f"[soak] health {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)

    from ilqr_tpu import SolverConfig, get_model
    from ilqr_tpu.models import acrobot as ac
    from ilqr_tpu.serve import SolverService

    model = get_model("acrobot")
    params = ac.default_params()
    cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                       max_iter=MAX_ITER)

    if MODE == "save":
        from ilqr_tpu.aot import compile_solver

        t0 = time.perf_counter()
        aot = compile_solver(model, params, cfg, 0.02, B_MAX, T,
                             path="fused", warm=True, fields=FIELDS)
        compile_s = time.perf_counter() - t0
        aot.save(BLOB)
        print(json.dumps({
            "mode": "soak_save", "B": B_MAX, "T": T,
            "compile_s": round(compile_s, 1),
            "blob_mb": round(os.path.getsize(BLOB) / 1e6, 1),
        }), flush=True)
        return
    if MODE == "resident_save":
        from ilqr_tpu.aot import compile_solver

        t0 = time.perf_counter()
        aot = compile_solver(model, params, cfg, 0.02, B_MAX, T,
                             path="fused", resident_slots=CONTROLLERS)
        compile_s = time.perf_counter() - t0
        aot.save(RES_BLOB)
        print(json.dumps({
            "mode": "soak_resident_save", "B": B_MAX, "T": T,
            "capacity": CONTROLLERS,
            "compile_s": round(compile_s, 1),
            "blob_mb": round(os.path.getsize(RES_BLOB) / 1e6, 1),
        }), flush=True)
        return

    resident = MODE == "resident"
    if resident:
        t0 = time.perf_counter()
        use_blob = os.path.exists(RES_BLOB)
        svc = SolverService(model, params, cfg, dt=0.02, horizon=T,
                            max_batch=B_MAX, max_wait_ms=5.0,
                            path="fused", warm=True,
                            resident_slots=CONTROLLERS,
                            aot=RES_BLOB if use_blob else None)
        # first dispatch pays the compile (or nothing, from a blob); do
        # it solo so the timing and the soak loop start warm
        svc.solve(np.zeros(4, np.float32), slot=0, timeout=3000)
        src = "blob" if use_blob else "in-process compile"
        print(f"[soak] resident first solve via {src}: "
              f"{time.perf_counter() - t0:.1f}s after construct, "
              f"{time.perf_counter() - PROC_T0:.1f}s after process "
              "start", file=sys.stderr, flush=True)
    else:
        svc = SolverService(model, params, cfg, dt=0.02, horizon=T,
                            max_batch=B_MAX, max_wait_ms=5.0,
                            path="fused", warm=True, fields=FIELDS,
                            aot=BLOB)
    rng = np.random.default_rng(3)
    x0s = (0.05 * rng.normal(size=(CONTROLLERS, 4))).astype(np.float32)

    lock = threading.Lock()
    lat_ms = []
    done_evt = threading.Event()
    state = {"replans": 0, "stop": False, "errors": 0}
    rss_samples = [(0.0, rss_mb())]
    t_start = time.perf_counter()

    def submit_next(i, prev):
        t_sub = time.perf_counter()
        if resident:
            fut = svc.submit(x0s[i], slot=i)
        else:
            fut = svc.submit(x0s[i], prev=prev)

        def cb(fut, i=i, t_sub=t_sub):
            try:
                sol = fut.result()
            except Exception as e:  # noqa: BLE001
                with lock:
                    state["errors"] += 1
                    state["stop"] = True
                print(f"[soak] ERROR: {e}", file=sys.stderr, flush=True)
                done_evt.set()
                return
            now = time.perf_counter()
            with lock:
                lat_ms.append((now - t_sub) * 1e3)
                state["replans"] += 1
                stop = state["stop"] or (
                    now - t_start > SOAK_S
                    and state["replans"] >= MIN_REPLANS)
                if stop:
                    state["stop"] = True
            if stop:
                done_evt.set()
                return
            # next replan: drift the state a little, warm-start from sol
            x0s[i] += (0.01 * np.sin(now + i)).astype(np.float32)
            submit_next(i, sol)

        fut.add_done_callback(cb)

    for i in range(CONTROLLERS):
        submit_next(i, None)  # prev=None → cold first plan

    # RSS sampler
    while not done_evt.wait(timeout=5.0):
        rss_samples.append(
            (round(time.perf_counter() - t_start, 1), rss_mb()))
    # let in-flight lanes drain, then close
    time.sleep(2.0)
    svc.close(timeout=120)
    elapsed = time.perf_counter() - t_start
    rss_samples.append((round(elapsed, 1), rss_mb()))

    lat = np.asarray(lat_ms)
    stats = dict(svc.stats)
    out = {
        "mode": ("soak_resident_1024" if resident else "soak_warm_1024"),
        "via_blob": bool(resident and os.path.exists(RES_BLOB)),
        "B": B_MAX, "T": T,
        "controllers": CONTROLLERS,
        "replans": int(state["replans"]),
        "errors": int(state["errors"]),
        "elapsed_s": round(elapsed, 1),
        "replans_per_s": round(state["replans"] / elapsed, 1),
        "lat_p50_ms": round(float(np.percentile(lat, 50)), 1),
        "lat_p99_ms": round(float(np.percentile(lat, 99)), 1),
        "batches": int(stats["batches"]),
        "lanes_per_batch": round(stats["lanes"] / max(stats["batches"], 1),
                                 1),
        "batch_s_mean": round(stats["solve_s"] / max(stats["batches"], 1),
                              3),
        "rss_start_mb": rss_samples[0][1],
        "rss_end_mb": rss_samples[-1][1],
        "rss_max_mb": max(r for _, r in rss_samples),
        "rss_samples": rss_samples[:: max(1, len(rss_samples) // 12)],
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
