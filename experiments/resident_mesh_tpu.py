"""TPU evidence for resident_slots + mesh=: the slot-sharded fleet on a
1-device TPU mesh vs the unsharded resident service (mesh-size
independence of the sharding/vma typing — the serve_mesh_tpu /
mesh_aot_tpu discipline applied to the resident dispatch).

Phase base (RM_MODE=base): unsharded resident service from the
no-compile blob (serve_resident1024.aotexec, chain J) — cold solves on
slots 0..REQS-1 plus one warm replan each; costs saved.

Phase mesh (RM_MODE=mesh): SolverService(resident_slots=2048,
mesh=1-device-TPU-mesh) — compiles the sharded donated-state program
(~240 s), runs the same requests, compares costs against phase base.

Phase aotsave (RM_MODE=aotsave): compile_solver(resident_slots=2048,
mesh=...) → serve_resident_mesh.aotexec (the resident×mesh×AOT cell).
Phase aotserve (RM_MODE=aotserve): a FRESH process loads the sharded
resident blob into SolverService(resident_slots=, mesh=, aot=), runs
the same requests, and compares against phase base — cross-process
bit-exactness through the full matrix cell.
"""

import json
import os
import sys
import time

import numpy as np

MODE = os.environ.get("RM_MODE", "base")
HERE = os.path.dirname(os.path.abspath(__file__))
RES_BLOB = os.path.join(HERE, "serve_resident1024.aotexec")
RM_BLOB = os.path.join(HERE, "serve_resident_mesh.aotexec")
COSTS = os.path.join(HERE, "resident_mesh_base.costs.npy")
B_MAX, T, MAX_ITER, CAP, REQS = 1024, 199, 10, 2048, 8


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    a = jnp.ones((256, 256), jnp.float32)
    (a @ a).block_until_ready()
    print(f"[rm] health {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)

    from ilqr_tpu import SolverConfig, get_model
    from ilqr_tpu.models import acrobot as ac
    from ilqr_tpu.parallel.mesh import make_mesh
    from ilqr_tpu.serve import SolverService

    model = get_model("acrobot")
    params = ac.default_params()
    cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                       max_iter=MAX_ITER)
    if MODE == "aotsave":
        from ilqr_tpu.aot import compile_solver

        t0 = time.perf_counter()
        aot = compile_solver(model, params, cfg, 0.02, B_MAX, T,
                             path="fused", resident_slots=CAP,
                             mesh=make_mesh())
        compile_s = time.perf_counter() - t0
        aot.save(RM_BLOB)
        print(json.dumps({
            "mode": "resident_mesh_aotsave", "B": B_MAX, "T": T,
            "capacity": CAP, "compile_s": round(compile_s, 1),
            "blob_mb": round(os.path.getsize(RM_BLOB) / 1e6, 1),
        }), flush=True)
        return
    if MODE == "base":
        svc = SolverService(model, params, cfg, dt=0.02, horizon=T,
                            max_batch=B_MAX, max_wait_ms=2.0,
                            path="fused", warm=True, resident_slots=CAP,
                            aot=RES_BLOB)
    elif MODE == "aotserve":
        svc = SolverService(model, params, cfg, dt=0.02, horizon=T,
                            max_batch=B_MAX, max_wait_ms=2.0,
                            path="fused", warm=True, resident_slots=CAP,
                            mesh=make_mesh(), aot=RM_BLOB)
    else:
        svc = SolverService(model, params, cfg, dt=0.02, horizon=T,
                            max_batch=B_MAX, max_wait_ms=2.0,
                            path="fused", warm=True, resident_slots=CAP,
                            mesh=make_mesh())

    rng = np.random.default_rng(41)
    x0s = (0.05 * rng.normal(size=(REQS, 4))).astype(np.float32)
    t0 = time.perf_counter()
    cold = [svc.solve(x0s[i], slot=i, timeout=3000)
            for i in range(REQS)]
    first_s = time.perf_counter() - t0
    warm = [svc.solve(x0s[i] + np.float32(0.01), slot=i, timeout=600)
            for i in range(REQS)]
    svc.close(timeout=60)
    costs = np.asarray([float(s.cost) for s in cold]
                       + [float(s.cost) for s in warm], np.float64)
    out = {"mode": f"resident_mesh_{MODE}", "B": B_MAX, "T": T,
           "capacity": CAP, "first_batch_s": round(first_s, 1)}
    if MODE == "base":
        np.save(COSTS, costs)
        out["mean_cost"] = round(float(costs.mean()), 6)
    else:
        ref = np.load(COSTS)
        d = np.abs(costs - ref)
        out["max_abs_dcost_vs_base"] = float(d.max())
        out["bit_exact"] = bool(d.max() == 0.0)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
