"""Secondary-workload TPU benchmarks on the fused solver (round-2 kernels).

SB_MODE: m2 | m3 | mpc | mpc1 | m4_enum | m4_iter | m4_pn | m4_fused |
m6_fused | m8_fused | m12_pn
  m2  — reference integrator workload: double integrator, T=99, ≤100 iters
  m3  — 3D point mass (27-candidate in-kernel QP), T=99, ≤100 iters
  mpc — fleet MPC: 1024 controllers, T=199, warm-started ≤20-iter replans
  m4_enum / m4_iter / m4_pn — quadrotor (n=12, m=4) on the vmap path:
  exact 81-candidate enumeration QP, the reference-style iterative
  projected Newton (explicitly pinned — 'auto' now selects pn_fixed on
  TPU), and the fixed-shape projected Newton (one mode per process —
  different programs, axon discipline)
  m12_pn — thruster_ring (n=6, m=12 > MAX_FUSED_M) on the vmap path with
  boxqp_mode='pn_fixed': the only TPU-viable route past the fused-m cap
  (VERDICT r3 item 1; target >= 1000 solves/s)
  m4_fused — quadrotor on the FUSED solver (in-kernel 81-candidate QP,
  two-kernel iteration; auto caps the time block for the big body)
  m6_fused — omni_thruster (n=6, m=6) on the FUSED solver: the general-m
  in-kernel projected-Newton boxQP (masked unrolled Cholesky) with the
  one-sided thrust boxes keeping half the controls on the lower bound
  m8_fused — free_flyer (n=6, m=8) on the FUSED solver AT the MAX_FUSED_M
  cap: full 8x8 masked Cholesky, 5-dim thrust null space resolved by the
  fuel cost, ~80% of controls pinned at the microgravity lower bound
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

MODE = os.environ.get("SB_MODE", "m2")
# Batch override for the fused modes: B>=2048 overlaps the ~26 ms
# dispatch+D2H floor across 1024-lane chunks (BENCH_NOTES B-sweep),
# reporting the device-true rate instead of the RPC floor.
BATCH = int(os.environ.get("SB_BATCH", "1024"))


def main():
    t0 = time.perf_counter()
    a = jnp.ones((256, 256), jnp.float32)
    (a @ a).block_until_ready()
    print(f"[sb] health {time.perf_counter() - t0:.1f}s", file=sys.stderr,
          flush=True)

    from ilqr_tpu import SolverConfig, get_model
    from ilqr_tpu.fused import solve_batch_fused, solve_batch_fused_warm

    rng = np.random.default_rng(0)
    B = 1024

    if MODE in ("m2", "m3"):
        if MODE == "m2":
            from ilqr_tpu.models import double_integrator as mm
            model = get_model("double_integrator")
            params = mm.default_params(goal=(1.0, 0.5, 0.0, 0.0))
            x0 = jnp.asarray([-1.0, 0.0, 0.0, -0.2], jnp.float32)[None] \
                + 0.1 * jnp.asarray(rng.normal(size=(B, 4)), jnp.float32)
        else:
            from ilqr_tpu.models import point_mass_3d as mm
            model = get_model("point_mass_3d")
            params = mm.default_params()
            x0 = jnp.asarray(0.3 * rng.normal(size=(B, 6)), jnp.float32)
        T = 99
        u0 = jnp.zeros((B, T, model.m), jnp.float32)
        cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                           max_iter=100)
        t0 = time.perf_counter()
        sol = solve_batch_fused(model, params, cfg, 0.02, x0, u0)
        np.asarray(sol.cost)
        first = time.perf_counter() - t0
        reps = []
        for _ in range(4):
            t0 = time.perf_counter()
            sol = solve_batch_fused(model, params, cfg, 0.02, x0, u0)
            np.asarray(sol.cost)
            reps.append(time.perf_counter() - t0)
        print(json.dumps({
            "mode": MODE, "B": B, "T": T,
            "solves_per_s": round(B / min(reps), 1),
            "best_s": round(min(reps), 4), "first_s": round(first, 1),
            "mean_cost": round(float(jnp.mean(sol.cost)), 4),
            "mean_iters": round(float(jnp.mean(sol.iterations)), 1),
        }), flush=True)
    elif MODE == "m4_fused":
        from ilqr_tpu.models import quadrotor as qd
        model = get_model("quadrotor")
        params = qd.default_params()
        B4, T = BATCH, 80
        cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                           max_iter=40)
        x0 = jnp.asarray(0.05 * rng.normal(size=(B4, 12)), jnp.float32)
        u0 = jnp.tile(qd.hover_control(params)[None].astype(jnp.float32),
                      (T, 1))
        t0 = time.perf_counter()
        sol = solve_batch_fused(model, params, cfg, 0.02, x0, u0)
        np.asarray(sol.cost)
        first = time.perf_counter() - t0
        reps = []
        for _ in range(4):
            x0r = jnp.asarray(0.05 * rng.normal(size=(B4, 12)),
                              jnp.float32)
            t0 = time.perf_counter()
            sol = solve_batch_fused(model, params, cfg, 0.02, x0r, u0)
            np.asarray(sol.cost)
            reps.append(time.perf_counter() - t0)
        print(json.dumps({
            "mode": MODE, "B": B4, "T": T,
            "solves_per_s": round(B4 / min(reps), 1),
            "best_s": round(min(reps), 4), "first_s": round(first, 1),
            "mean_cost": round(float(jnp.mean(sol.cost)), 4),
            "mean_iters": round(float(jnp.mean(sol.iterations)), 1),
        }), flush=True)
    elif MODE == "m8_fused":
        from ilqr_tpu.models import free_flyer as ff
        model = get_model("free_flyer")
        params = ff.default_params()
        B8, T = BATCH, 80
        cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                           max_iter=40)
        x0 = jnp.asarray(0.3 * rng.normal(size=(B8, 6)), jnp.float32)
        u0 = jnp.zeros((T, 8), jnp.float32)  # microgravity: coasting start
        t0 = time.perf_counter()
        sol = solve_batch_fused(model, params, cfg, 0.05, x0, u0)
        np.asarray(sol.cost)
        first = time.perf_counter() - t0
        reps = []
        for _ in range(4):
            x0r = jnp.asarray(0.3 * rng.normal(size=(B8, 6)), jnp.float32)
            t0 = time.perf_counter()
            sol = solve_batch_fused(model, params, cfg, 0.05, x0r, u0)
            np.asarray(sol.cost)
            reps.append(time.perf_counter() - t0)
        us = np.asarray(sol.us)
        print(json.dumps({
            "mode": MODE, "B": B8, "T": T,
            "solves_per_s": round(B8 / min(reps), 1),
            "best_s": round(min(reps), 4), "first_s": round(first, 1),
            "mean_cost": round(float(jnp.mean(sol.cost)), 4),
            "mean_iters": round(float(jnp.mean(sol.iterations)), 1),
            "frac_at_lower": round(float((us <= 1e-6).mean()), 3),
        }), flush=True)
    elif MODE == "m6_fused":
        from ilqr_tpu.models import omni_thruster as ot
        model = get_model("omni_thruster")
        params = ot.default_params()
        B6, T = BATCH, 80
        cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                           max_iter=40)
        x0 = jnp.asarray(0.2 * rng.normal(size=(B6, 6)), jnp.float32)
        u0 = jnp.tile(ot.hover_control(params)[None].astype(jnp.float32),
                      (T, 1))
        t0 = time.perf_counter()
        sol = solve_batch_fused(model, params, cfg, 0.05, x0, u0)
        np.asarray(sol.cost)
        first = time.perf_counter() - t0
        reps = []
        for _ in range(4):
            x0r = jnp.asarray(0.2 * rng.normal(size=(B6, 6)), jnp.float32)
            t0 = time.perf_counter()
            sol = solve_batch_fused(model, params, cfg, 0.05, x0r, u0)
            np.asarray(sol.cost)
            reps.append(time.perf_counter() - t0)
        us = np.asarray(sol.us)
        print(json.dumps({
            "mode": MODE, "B": B6, "T": T,
            "solves_per_s": round(B6 / min(reps), 1),
            "best_s": round(min(reps), 4), "first_s": round(first, 1),
            "mean_cost": round(float(jnp.mean(sol.cost)), 4),
            "mean_iters": round(float(jnp.mean(sol.iterations)), 1),
            "frac_at_lower": round(float((us <= 1e-6).mean()), 3),
        }), flush=True)
    elif MODE in ("m12_pn", "m12_fused"):
        # m=12 at the raised MAX_FUSED_M cap: the fused kernel path vs the
        # fixed-shape projected-Newton vmap path (the route for ANY m).
        # Both modes use the same first x0 draw, so the fused mode can
        # cross-check per-lane costs against the pn mode's saved array.
        from ilqr_tpu.batch import solve_batch
        from ilqr_tpu.models import thruster_ring as tr
        model = get_model("thruster_ring")
        params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float32), tr.default_params())
        B12, T = BATCH, 80
        if MODE == "m12_pn":
            # pure XLA scan path: pin the per-stage Pallas kernels OFF —
            # this measures boxqp_pn's vmap route, and the auto-engaged
            # rollout/derivs kernels at the never-compiled m=12 shapes
            # crashed the TPU worker on first contact (round4_log
            # 2026-08-20 11:53, "kernel fault").
            cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                               max_iter=40, boxqp_mode="pn_fixed",
                               backward_kernel="xla", rollout_kernel="xla",
                               deriv_kernel="xla")
        else:
            cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                               max_iter=40, boxqp_mode="auto")
        runner = solve_batch if MODE == "m12_pn" else solve_batch_fused
        x0 = jnp.asarray(0.2 * rng.normal(size=(B12, 6)), jnp.float32)
        u0 = jnp.zeros((T, 12), jnp.float32)
        t0 = time.perf_counter()
        sol = runner(model, params, cfg, 0.05, x0, u0)
        first_cost = np.asarray(sol.cost)
        first = time.perf_counter() - t0
        reps = []
        for _ in range(4):
            x0r = jnp.asarray(0.2 * rng.normal(size=(B12, 6)), jnp.float32)
            t0 = time.perf_counter()
            sol = runner(model, params, cfg, 0.05, x0r, u0)
            np.asarray(sol.cost)
            reps.append(time.perf_counter() - t0)
        us = np.asarray(sol.us)
        out = {
            "mode": MODE, "B": B12, "T": T,
            "solves_per_s": round(B12 / min(reps), 1),
            "best_s": round(min(reps), 4), "first_s": round(first, 1),
            "mean_cost": round(float(jnp.mean(sol.cost)), 4),
            "mean_iters": round(float(jnp.mean(sol.iterations)), 1),
            "frac_at_lower": round(float((us <= 1e-6).mean()), 3),
        }
        costs_path = os.path.join(os.path.dirname(__file__),
                                  f"m12_costs_b{B12}.npy")
        if MODE == "m12_pn":
            np.save(costs_path, first_cost)
        elif os.path.exists(costs_path):
            ref = np.load(costs_path)
            if ref.shape == first_cost.shape:
                out["max_rel_dcost_vs_pn"] = round(float(np.max(
                    np.abs(first_cost - ref) / (np.abs(ref) + 1e-9))), 6)
        print(json.dumps(out), flush=True)
    elif MODE in ("m4_enum", "m4_iter", "m4_pn"):
        # m=4 exceeds the round-2 fused kernels — this is the vmap/XLA
        # leg. The iterative variant's boxQP while_loops make tracing/
        # remote compile slow; B is kept small and max_iter modest.
        from ilqr_tpu.batch import solve_batch
        from ilqr_tpu.models import quadrotor as qd
        model = get_model("quadrotor")
        params = qd.default_params()
        B4, T = 256, 80
        cfg = SolverConfig(
            deriv_mode="analytic", clamp_forward=True, max_iter=40,
            boxqp_mode={"m4_enum": "enum", "m4_iter": "iterative",
                        "m4_pn": "pn_fixed"}[MODE])
        x0 = jnp.asarray(0.05 * rng.normal(size=(B4, 12)), jnp.float32)
        u0 = jnp.tile(qd.hover_control(params)[None].astype(jnp.float32),
                      (T, 1))
        t0 = time.perf_counter()
        sol = solve_batch(model, params, cfg, 0.02, x0, u0)
        np.asarray(sol.cost)
        first = time.perf_counter() - t0
        reps = []
        for _ in range(4):
            x0r = jnp.asarray(0.05 * rng.normal(size=(B4, 12)), jnp.float32)
            t0 = time.perf_counter()
            sol = solve_batch(model, params, cfg, 0.02, x0r, u0)
            np.asarray(sol.cost)
            reps.append(time.perf_counter() - t0)
        print(json.dumps({
            "mode": MODE, "B": B4, "T": T,
            "solves_per_s": round(B4 / min(reps), 1),
            "best_s": round(min(reps), 4), "first_s": round(first, 1),
            "mean_cost": round(float(jnp.mean(sol.cost)), 4),
            "mean_iters": round(float(jnp.mean(sol.iterations)), 1),
        }), flush=True)
    elif MODE == "mpc1":
        # single-controller replan latency (B=1 block; the real-time path)
        from ilqr_tpu.models import acrobot as ac
        model = get_model("acrobot")
        params = ac.default_params()
        T = 199
        cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                           max_iter=10)
        x0 = jnp.asarray(0.05 * rng.normal(size=(1, 4)), jnp.float32)
        u0 = jnp.zeros((1, T, 1), jnp.float32)
        sol = solve_batch_fused(model, params, cfg, 0.02, x0, u0)
        jax.block_until_ready(sol.cost)
        sol = solve_batch_fused_warm(model, params, cfg, 0.02, x0, sol)
        np.asarray(sol.cost)
        lats = []
        for _ in range(10):
            x0 = x0 + jnp.asarray(
                0.002 * rng.normal(size=(1, 4)), jnp.float32)
            t0 = time.perf_counter()
            sol = solve_batch_fused_warm(model, params, cfg, 0.02, x0, sol)
            np.asarray(sol.cost)
            lats.append(time.perf_counter() - t0)
        print(json.dumps({
            "mode": "mpc_single", "T": T,
            "latency_ms_best": round(min(lats) * 1e3, 1),
            "latency_ms_median": round(sorted(lats)[len(lats) // 2] * 1e3,
                                       1),
            "mean_iters": round(float(jnp.mean(sol.iterations)), 1),
        }), flush=True)
    elif MODE == "mpc":
        from ilqr_tpu.models import acrobot as ac
        model = get_model("acrobot")
        params = ac.default_params()
        T = 199
        cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                           max_iter=20)
        x0 = jnp.asarray(0.05 * rng.normal(size=(B, 4)), jnp.float32)
        u0 = jnp.zeros((B, T, 1), jnp.float32)
        sol = solve_batch_fused(model, params, cfg, 0.02, x0, u0)
        jax.block_until_ready(sol.cost)
        wcfg = cfg.replace(max_iter=20)
        # steady state: perturb states, warm replan
        t0 = time.perf_counter()
        sol = solve_batch_fused_warm(model, params, wcfg, 0.02, x0, sol)
        np.asarray(sol.cost)
        first = time.perf_counter() - t0
        reps = []
        for _ in range(6):
            x0 = x0 + jnp.asarray(
                0.002 * rng.normal(size=(B, 4)), jnp.float32)
            t0 = time.perf_counter()
            sol = solve_batch_fused_warm(model, params, wcfg, 0.02, x0, sol)
            np.asarray(sol.cost)
            reps.append(time.perf_counter() - t0)
        print(json.dumps({
            "mode": "mpc_fleet", "B": B, "T": T,
            "replans_per_s": round(B / min(reps), 1),
            "cycle_ms": round(min(reps) * 1e3, 1),
            "first_s": round(first, 1),
            "mean_iters": round(float(jnp.mean(sol.iterations)), 1),
        }), flush=True)


if __name__ == "__main__":
    main()
