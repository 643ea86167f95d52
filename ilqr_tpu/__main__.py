"""CLI entry point: ``python -m ilqr_tpu {acrobot|integrator|...}``.

Mirrors the reference CLI (ref: src/run_ilqr.cpp:6-65) — same two canonical
workloads, same iteration table (SHOWPROGRESS), same output CSV — plus flags
the reference hard-codes: horizon, dt, derivative mode, corrected-mode
toggles, batch size, and backend selection.
"""

from __future__ import annotations

import argparse
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m ilqr_tpu",
        description="TPU-native iLQR/DDP trajectory optimization",
    )
    p.add_argument(
        "problem",
        choices=["acrobot", "integrator", "double_integrator", "pendulum",
                 "cartpole", "bicycle", "free_flyer", "omni_thruster",
                 "point_mass_3d", "power_mass", "quadrotor",
                 "thruster_ring", "thruster_ring16", "thruster_ring20",
                 "thruster_ring24"],
        help="canonical workload to solve (ref: run_ilqr.cpp:8-12)",
    )
    p.add_argument("--dt", type=float, default=None,
                   help="timestep (default: the problem's canonical value;"
                        " the reference uses 0.02 for both its workloads)")
    p.add_argument("--horizon", "-T", type=int, default=None,
                   help="horizon; defaults to the reference's per-problem value")
    p.add_argument("--max-iter", type=int, default=100)
    p.add_argument("--deriv-mode", choices=["analytic", "fd"], default="fd",
                   help="fd = reference-parity central differences")
    p.add_argument("--clamp-forward", action="store_true",
                   help="corrected mode: clamp controls in the rollout "
                        "(the reference does not, ilqr_core.cpp:322-329)")
    p.add_argument("--no-control-limits", action="store_true")
    p.add_argument("--full-ddp", action="store_true",
                   help="include exact second-order dynamics terms "
                        "(Vx·fxx etc.) in the backward pass — Tassa's "
                        "full_DDP, absent from the reference; implies "
                        "--deriv-mode analytic")
    p.add_argument("--integrator-scheme", choices=["euler", "rk4"],
                   default="euler")
    p.add_argument("--boxqp-mode",
                   choices=["auto", "iterative", "enum", "pn_fixed"],
                   default="auto",
                   help="inner QP: closed-form/enum exact solves (auto/"
                        "enum), the reference-semantics projected Newton "
                        "(iterative, ref src/boxqp.cpp), or the fixed-"
                        "shape projected Newton for any m (pn_fixed — the "
                        "TPU-fast vmap path; auto picks it on TPU for "
                        "m >= 2)")
    p.add_argument("--sweep-kernel", choices=["merged", "split"],
                   default="merged",
                   help="fused solver: merged linearize+backward kernel or "
                        "split derivative+backward kernels")
    p.add_argument("--backward-mode",
                   choices=["scan", "assoc", "assoc_frozen"],
                   default="scan",
                   help="assoc = parallel-in-time associative-scan backward "
                        "(unconstrained problems only); assoc_frozen = its "
                        "control-limited extension via frozen-active-set "
                        "refinement sweeps")
    p.add_argument("--iter-kernel", choices=["auto", "merged", "split"],
                   default="auto",
                   help="fused solver: run the whole iteration (backward + "
                        "line search) as ONE Pallas call with VMEM-resident "
                        "gains (merged), or as two kernels (split); auto "
                        "picks merged when the gain scratch fits VMEM")
    p.add_argument("--batch", type=int, default=0,
                   help="solve a batch of B perturbed problems instead of one")
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    p.add_argument("--x64", action="store_true",
                   help="float64 (parity with the double-precision reference)")
    p.add_argument("--output", default="ilqr_result.csv",
                   help="trajectory CSV path (ref hardcodes ilqr_result.csv)")
    p.add_argument("--quiet", action="store_true",
                   help="skip the per-iteration table (single fused solve)")
    p.add_argument("--profile", action="store_true",
                   help="print the per-phase timing breakdown (the "
                        "reference's TIMESTUFF report, ilqr_core.cpp:290-298)")
    p.add_argument("--plot", metavar="PNG",
                   help="save a state/control plot of the result")
    return p


# Canonical problem setups (ref: src/run_ilqr.cpp:18-54).
_PROBLEMS = {
    "integrator": dict(model="double_integrator", T=99,
                       goal=(1.0, 0.5, 0.0, 0.0),
                       x0=(-1.0, 0.0, 0.0, -0.2)),
    "double_integrator": dict(model="double_integrator", T=99,
                              goal=(1.0, 0.5, 0.0, 0.0),
                              x0=(-1.0, 0.0, 0.0, -0.2)),
    "acrobot": dict(model="acrobot", T=499, goal=None, x0=(0.0, 0.0, 0.0, 0.0)),
    "pendulum": dict(model="pendulum", T=199, goal=None, x0=(0.0, 0.0)),
    "cartpole": dict(model="cartpole", T=299, goal=None,
                     x0=(0.0, 0.0, 0.0, 0.0)),
    "point_mass_3d": dict(model="point_mass_3d", T=99, goal=None,
                          x0=(0.0,) * 6),
    # kinematic bicycle lane change: dt=0.05 (driving timescale)
    "bicycle": dict(model="bicycle", T=100, goal=None, x0=(0.0,) * 4,
                    dt=0.05),
    # power-limited point mass: live cost cross terms (cxu != 0)
    "power_mass": dict(model="power_mass", T=120, goal=None, x0=(0.0,) * 4,
                       dt=0.05),
    # quadrotor launches from rest with hover thrust as the initial
    # control sequence (zero thrust would free-fall the initial rollout)
    "quadrotor": dict(model="quadrotor", T=120, goal=None, x0=(0.0,) * 12,
                      u0="hover"),
    # 6-thruster craft: one-sided thrust boxes; starts at gravity-cancel
    # hover thrust (zero thrust free-falls the initial rollout)
    "omni_thruster": dict(model="omni_thruster", T=120, goal=None,
                          x0=(0.0,) * 6, dt=0.05, u0="hover"),
    # 8-thruster microgravity free-flyer: runs the fused solver at its
    # m=8 cap; zero thrust is the natural initial control (no gravity)
    "free_flyer": dict(model="free_flyer", T=120, goal=None,
                       x0=(0.0,) * 6, dt=0.05),
    # 12-thruster planar ring (in-kernel projected-Newton QP)
    "thruster_ring": dict(model="thruster_ring", T=100, goal=None,
                          x0=(0.0,) * 6, dt=0.05),
    # 16-thruster ring (round-5 m16_fused row: 6,474 solves/s, 750 s
    # Mosaic compile)
    "thruster_ring16": dict(model="thruster_ring16", T=100, goal=None,
                            x0=(0.0,) * 6, dt=0.05),
    # 20-thruster ring (m20_fused row: 4,104 solves/s, 1,065 s compile)
    "thruster_ring20": dict(model="thruster_ring20", T=100, goal=None,
                            x0=(0.0,) * 6, dt=0.05),
    # 24-thruster ring: AT the round-5 final MAX_FUSED_M = 24 cap
    # (m24_fused row: 2,616 solves/s, 2,166 s Mosaic compile — AOT it)
    "thruster_ring24": dict(model="thruster_ring24", T=100, goal=None,
                            x0=(0.0,) * 6, dt=0.05),
}


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.x64:
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np

    from ilqr_tpu import SolverConfig, get_model, solve, solve_verbose
    from ilqr_tpu.batch import convergence_stats, solve_batch
    from ilqr_tpu.utils.io import write_trajectory_csv

    spec = _PROBLEMS[args.problem]
    if args.dt is None:
        args.dt = spec.get("dt", 0.02)
    model = get_model(spec["model"])
    params = (model.default_params(goal=spec["goal"]) if spec["goal"]
              else model.default_params())
    T = args.horizon or spec["T"]
    x0 = jnp.asarray(spec["x0"])
    if spec.get("u0") == "hover":
        if spec["model"] == "quadrotor":
            from ilqr_tpu.models import quadrotor as _hover_mod
        else:
            from ilqr_tpu.models import omni_thruster as _hover_mod

        u0 = jnp.tile(_hover_mod.hover_control(params)[None].astype(x0.dtype),
                      (T, 1))
    else:
        u0 = jnp.zeros((T, model.m), x0.dtype)

    cfg = SolverConfig(
        max_iter=args.max_iter,
        deriv_mode="analytic" if args.full_ddp else args.deriv_mode,
        full_ddp=args.full_ddp,
        clamp_forward=args.clamp_forward,
        use_control_limits=not args.no_control_limits,
        integrator=args.integrator_scheme,
        boxqp_mode=args.boxqp_mode,
        sweep_kernel=args.sweep_kernel,
        backward_mode=args.backward_mode,
        iter_kernel=args.iter_kernel,
    )
    if args.backward_mode == "assoc" and cfg.use_control_limits:
        build_parser().error(
            "--backward-mode assoc requires --no-control-limits "
            "(the associative-scan backward is unconstrained-only)")

    print(f"[ilqr_tpu] {args.problem}: n={model.n} m={model.m} T={T} "
          f"dt={args.dt} deriv={cfg.deriv_mode} backend="
          f"{jax.default_backend()}")

    if args.batch:
        rng = np.random.default_rng(0)
        x0b = x0[None] + 0.05 * jnp.asarray(
            rng.normal(size=(args.batch, model.n))
        ).astype(x0.dtype)
        t0 = time.perf_counter()
        from ilqr_tpu.fused import fused_applicable

        use_fused = (fused_applicable(model, cfg)
                     and cfg.backward_mode == "scan"
                     and not args.x64  # fused kernels are f32-only
                     and jax.default_backend() == "tpu")
        if use_fused:
            from ilqr_tpu.fused import solve_batch_fused

            sol = solve_batch_fused(
                model, params, cfg, args.dt,
                jnp.asarray(x0b, jnp.float32),
                jnp.asarray(u0, jnp.float32))
        else:
            sol = solve_batch(model, params, cfg, args.dt, x0b, u0)
        jax.block_until_ready(sol.cost)
        elapsed = time.perf_counter() - t0
        stats = {k: float(v) for k, v in convergence_stats(sol).items()}
        print(f"batch of {args.batch} solves in {elapsed:.3f}s "
              f"({args.batch / elapsed:.1f} solves/s, incl. compile)")
        for k, v in stats.items():
            print(f"  {k:<18s} {v:.6g}")
        best = int(jnp.argmin(sol.cost))
        write_trajectory_csv(args.output, sol.xs[best], sol.us[best])
        print(f"Wrote best trajectory to {args.output}")
        return 0

    t0 = time.perf_counter()
    if args.quiet:
        sol = solve(model, params, cfg, args.dt, x0, u0)
        jax.block_until_ready(sol.cost)
    else:
        sol = solve_verbose(model, params, cfg, args.dt, x0, u0)
    elapsed = time.perf_counter() - t0

    # Matches the reference's closing lines (run_ilqr.cpp:58-64).
    print(f"Final cost: {float(sol.cost):.6g}  "
          f"iterations: {int(sol.iterations)}")
    print(f"Solve took {elapsed:.3f} seconds (incl. compile).")
    write_trajectory_csv(args.output, sol.xs, sol.us)
    print(f"Wrote trajectory to {args.output}")

    if args.profile:
        from ilqr_tpu.utils.timing import profile_phases

        _timer, report = profile_phases(
            model, params, cfg, args.dt, x0, u0, n_iters=5)
        print(report)
    if args.plot:
        from ilqr_tpu.utils.plotting import plot_trajectory

        plot_trajectory(sol.xs, sol.us, dt=args.dt,
                        title=args.problem, save_path=args.plot)
        print(f"Wrote plot to {args.plot}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
