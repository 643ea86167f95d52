"""On-device validation of check_vma=True on the sharded fused solver.

The vma threading (utils/vma.sds on every pallas_call out shape + carry
promotion) is trace-checked on CPU (tests/test_vma_trace.py), but the
actual Mosaic compile+execute under a vma-checked shard_map only happens
on TPU. check_vma typing is mesh-size independent, so a 1-device TPU mesh
exercises the full contract: shard_map(check_vma=True) → Mosaic kernels
declaring batch-varying outputs → execution → results bit-exact against
the plain (unsharded) fused solve.

One program per TPU process (axon discipline); appends one JSON line to
experiments/secondary_results.jsonl via stdout redirection by the caller.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    t0 = time.perf_counter()
    a = jnp.ones((256, 256), jnp.float32)
    (a @ a).block_until_ready()
    print(f"[checkvma] health {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)
    assert jax.default_backend() == "tpu", jax.default_backend()

    from ilqr_tpu import SolverConfig, get_model
    from ilqr_tpu.fused import solve_batch_fused
    from ilqr_tpu.models import acrobot as ac
    from ilqr_tpu.parallel.mesh import make_mesh, make_sharded_fused_solver

    model = get_model("acrobot")
    params = ac.default_params()
    rng = np.random.default_rng(11)
    B, T = 1024, 99
    cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                       max_iter=12)
    x0 = jnp.asarray(0.05 * rng.normal(size=(B, 4)), jnp.float32)
    u0 = jnp.zeros((B, T, 1), jnp.float32)

    mesh = make_mesh()  # 1 real device — vma typing is size-independent
    run = make_sharded_fused_solver(model, cfg, mesh)  # check_vma=True on TPU

    t0 = time.perf_counter()
    sol_sh = run(params, 0.02, x0, u0)
    np.asarray(sol_sh.cost)
    first = time.perf_counter() - t0

    # same kernels, unsharded — must be bit-exact
    sol = solve_batch_fused(model, params, cfg, 0.02, x0, u0)
    max_dc = float(jnp.max(jnp.abs(sol_sh.cost - sol.cost)))
    max_du = float(jnp.max(jnp.abs(sol_sh.us - sol.us)))

    print(json.dumps({
        "mode": "checkvma_sharded_fused", "B": B, "T": T,
        "mesh_devices": int(mesh.size), "check_vma": True,
        "first_s": round(first, 1),
        "max_cost_delta_vs_unsharded": max_dc,
        "max_us_delta_vs_unsharded": max_du,
        "mean_cost": round(float(jnp.mean(sol_sh.cost)), 4),
        "ok": bool(max_dc == 0.0 and max_du == 0.0),
    }), flush=True)


if __name__ == "__main__":
    main()
