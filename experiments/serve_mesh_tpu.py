"""TPU evidence for SolverService(mesh=...): construct the service over a
1-device TPU mesh (the vma-threaded sharded fused solver), serve a small
burst, and compare per-request costs against the direct unsharded fused
solve — the mesh analogue of the checkvma_sharded_fused row. Mesh-size
independence of the sharding/vma typing means a 1-device pass validates
the multi-chip serving contract Mosaic-side (see parallel/mesh.py).
"""

import json
import sys
import time

import numpy as np

B_MAX, T, MAX_ITER, REQS = 256, 99, 10, 8


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    a = jnp.ones((256, 256), jnp.float32)
    (a @ a).block_until_ready()
    print(f"[serve_mesh] health {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)

    from ilqr_tpu import SolverConfig, get_model
    from ilqr_tpu.fused import solve_batch_fused
    from ilqr_tpu.models import acrobot as ac
    from ilqr_tpu.parallel.mesh import make_mesh
    from ilqr_tpu.serve import SolverService

    model = get_model("acrobot")
    params = ac.default_params()
    cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                       max_iter=MAX_ITER)
    mesh = make_mesh()
    t0 = time.perf_counter()
    svc = SolverService(model, params, cfg, dt=0.02, horizon=T,
                        max_batch=B_MAX, max_wait_ms=2.0, path="fused",
                        mesh=mesh)
    rng = np.random.default_rng(11)
    x0s = (0.05 * rng.normal(size=(REQS, 4))).astype(np.float32)
    first = svc.solve(x0s[0], timeout=1800)
    warm_s = time.perf_counter() - t0
    futs = [svc.submit(x) for x in x0s[1:]]
    costs = [float(first.cost)] + [float(f.result(timeout=600).cost)
                                   for f in futs]
    svc.close(timeout=60)

    # direct unsharded fused solve of the same problems
    ref = solve_batch_fused(
        model, params, cfg, 0.02, jnp.asarray(x0s),
        jnp.zeros((REQS, T, 1), jnp.float32))
    ref_costs = np.asarray(ref.cost)
    d = np.abs(np.asarray(costs) - ref_costs)
    print(json.dumps({
        "mode": "serve_mesh_tpu", "mesh_devices": int(mesh.size),
        "B_max": B_MAX, "T": T, "max_iter": MAX_ITER, "requests": REQS,
        "warm_s": round(warm_s, 1),
        "max_cost_delta_vs_unsharded_fused": float(d.max()),
        "mean_cost": round(float(np.mean(costs)), 4),
        "ok": bool(d.max() == 0.0),
    }), flush=True)


if __name__ == "__main__":
    main()
