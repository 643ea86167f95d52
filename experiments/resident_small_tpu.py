"""Small-fleet resident latency: the apples-to-apples against round 4's
32-controller prev= warm fleet (serve_warm_mpc: p50 102 ms at 256
replans/s after input packing). Same shape family (acrobot T=199,
≤10 iters), SolverService(resident_slots=32, max_batch=32): each
controller replans in lock-step waves; the resident dispatch's
~1 KB H2D + fields-only D2H should cut the per-replan latency well
under the prev= route's.
"""

import json
import sys
import time

import numpy as np

C, T, MAX_ITER, WAVES = 32, 199, 10, 60


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    a = jnp.ones((256, 256), jnp.float32)
    (a @ a).block_until_ready()
    print(f"[rsm] health {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)

    from ilqr_tpu import SolverConfig, get_model
    from ilqr_tpu.models import acrobot as ac
    from ilqr_tpu.serve import SolverService

    model = get_model("acrobot")
    params = ac.default_params()
    cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                       max_iter=MAX_ITER)
    t0 = time.perf_counter()
    svc = SolverService(model, params, cfg, dt=0.02, horizon=T,
                        max_batch=C, max_wait_ms=2.0, path="fused",
                        warm=True, resident_slots=C)
    rng = np.random.default_rng(5)
    x0s = (0.05 * rng.normal(size=(C, 4))).astype(np.float32)
    # cold wave (pays the compile)
    futs = [svc.submit(x0s[i], slot=i) for i in range(C)]
    [f.result(timeout=3000) for f in futs]
    compile_s = time.perf_counter() - t0

    lat = []
    t_run = time.perf_counter()
    for _ in range(WAVES):
        t0 = time.perf_counter()
        futs = [svc.submit(x0s[i], slot=i) for i in range(C)]
        sols = [f.result(timeout=600) for f in futs]
        lat.append((time.perf_counter() - t0) * 1e3)
        for i, s in enumerate(sols):
            x0s[i] += np.float32(0.002)
    elapsed = time.perf_counter() - t_run
    svc.close(timeout=60)
    lat = np.asarray(lat)
    print(json.dumps({
        "mode": "resident_small", "controllers": C, "T": T,
        "compile_first_s": round(compile_s, 1),
        "waves": WAVES,
        "replans_per_s": round(C * WAVES / elapsed, 1),
        "wave_p50_ms": round(float(np.percentile(lat, 50)), 1),
        "wave_p99_ms": round(float(np.percentile(lat, 99)), 1),
    }), flush=True)


if __name__ == "__main__":
    main()
