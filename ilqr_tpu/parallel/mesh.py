"""Multi-chip / multi-host scaling over a device mesh.

The reference has no distributed anything (SURVEY §2: no MPI/NCCL/Gloo).
The TPU-native scaling story for iLQR is problem-level data parallelism:
solves are embarrassingly parallel, so the batch axis is sharded over a 1-D
``('batch',)`` mesh spanning ICI (and DCN across hosts via
``jax.distributed``). Collectives are needed only to reduce convergence
statistics — ``psum``/``pmax`` on the batch axis inside ``shard_map``.

On a multi-host pod slice, call :func:`init_distributed` first; the mesh then
spans all global devices and each host feeds its local shard.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ilqr_tpu.config import SolverConfig
from ilqr_tpu.models.base import Model
from ilqr_tpu.solver import solve
from ilqr_tpu.types import Solution

BATCH_AXIS = "batch"


def init_distributed(**kwargs):
    """Multi-host initialization: ``jax.distributed.initialize`` passthrough
    (coordinator_address / num_processes / process_id, or TPU-pod
    auto-detection with no args). The mesh from :func:`make_mesh` then spans
    all global devices and each process feeds its local shard.

    Idempotent — a second call is a no-op. Any other failure (bad
    coordinator address, process count mismatch, …) propagates: silently
    falling back to single-process would shard a "global" solve over a
    fraction of the fleet. Exercised for real by
    tests/test_distributed_multiprocess.py (2 CPU processes over
    localhost)."""
    from jax._src import distributed as _dist

    state = getattr(_dist, "global_state", None)
    if state is not None and getattr(state, "client", None) is not None:
        return  # already initialized
    jax.distributed.initialize(**kwargs)


def make_mesh(devices=None, axis_name: str = BATCH_AXIS) -> Mesh:
    """1-D mesh over all (or the given) devices."""
    devices = np.asarray(jax.devices() if devices is None else devices)
    return Mesh(devices.reshape(-1), (axis_name,))


def _shard_map():
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    return shard_map


def _check_divisible(b: int, mesh: Mesh) -> None:
    """Sharded solvers require B divisible by the mesh size (solves are
    whole units — there is no meaningful padding for a partial solve, and
    an uneven NamedSharding would otherwise fail deep inside GSPMD with an
    opaque error)."""
    if b % mesh.size != 0:
        raise ValueError(
            f"batch size {b} is not divisible by the mesh size {mesh.size};"
            f" pad the batch to a multiple of {mesh.size} (padded lanes are"
            " cheap — they converge immediately) or use a smaller mesh")


def make_sharded_solver(
    model: Model,
    cfg: SolverConfig,
    mesh: Optional[Mesh] = None,
    params_batched: bool = False,
):
    """Returns a jitted solver whose batch axis is sharded over the mesh.

    The returned fn maps (params, dt, x0:(B,n), u0:(B,T,m)) → Solution with
    every output sharded the same way. B must be divisible by mesh size.

    Implementation: ``shard_map`` — manual partitioning, so each device runs
    its LOCAL batch through the full solver (including the fused Pallas
    kernels, which GSPMD cannot partition automatically). Solves are
    independent, so the hot loop has no cross-device communication at all;
    collectives appear only in :func:`sharded_convergence_stats`.
    """
    mesh = make_mesh() if mesh is None else mesh
    batch_spec = NamedSharding(mesh, P(BATCH_AXIS))
    repl = NamedSharding(mesh, P())

    # with_vma_axes promotes the solver's constant-initialized loop
    # carries to batch-varying (utils/vma.py) so the varying-manual-axes
    # checker passes — this retired the round-1/2 check_vma=False
    # workaround (jax 0.9, 2026-08).
    cfg_v = cfg.with_vma_axes((BATCH_AXIS,))

    def local_solve(params, dt, x0, u0):
        from ilqr_tpu.utils.vma import vary

        # Promote the replicated params/dt to batch-varying up front: jax's
        # automatic invariant→varying insertion mis-fires inside
        # vmap(jacfwd(...)) (jax 0.9 — it re-applies pvary to an already-
        # varying dual number); with every input varying it never triggers.
        params, dt = vary((params, dt), (BATCH_AXIS,))
        in_axes = (0 if params_batched else None, None, 0, 0)
        return jax.vmap(
            lambda p, d, x, u: solve(model, p, cfg_v, d, x, u),
            in_axes=in_axes,
        )(params, dt, x0, u0)

    p_spec = P(BATCH_AXIS) if params_batched else P()
    fn = _shard_map()(
        local_solve,
        mesh=mesh,
        in_specs=(p_spec, P(), P(BATCH_AXIS), P(BATCH_AXIS)),
        out_specs=P(BATCH_AXIS),
        check_vma=True,
    )
    jitted = jax.jit(fn)
    param_shard = batch_spec if params_batched else repl

    def run(params, dt, x0, u0) -> Solution:
        _check_divisible(x0.shape[0], mesh)
        params = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, param_shard), params)
        x0 = jax.device_put(x0, batch_spec)
        u0 = jax.device_put(u0, batch_spec)
        return jitted(params, jnp.asarray(dt), x0, u0)

    run.jitted = jitted  # exposed for lowering/HLO inspection (benchmarks)
    return run


def make_sharded_fused_solver(
    model: Model,
    cfg: SolverConfig,
    mesh: Optional[Mesh] = None,
    interpret: Optional[bool] = None,
):
    """Multi-chip deployment of the fused kernel-layout solver
    (ilqr_tpu/fused.py): the batch axis is sharded over the mesh and each
    device runs its local shard through the fused single-block path.

    The returned fn maps (params, dt, x0 (B, n), u0 (B, T, m)) → Solution.
    B must be divisible by the mesh size; the per-device shard should be
    ≤ 1024 (one kernel block) for peak throughput — larger local shards
    raise (host-side chunking can't run inside shard_map; call once per
    1024×n_devices instead). Shared params only.

    ``check_vma`` state: ON for compiled (Mosaic) kernels — the kernels
    declare their outputs batch-varying (utils/vma.sds) and fused.py
    promotes the constant loop carries (utils/vma.vary). It must stay OFF
    in interpret mode (off-TPU tests): interpret-mode ``pallas_call``
    evaluates the kernel body through an internal grid ``while_loop``
    whose carries cannot thread vma (jax 0.9 limitation — the body mixes
    the invariant output-buffer init with varying operands; re-tested
    2026-08-20 on jax 0.9.0: still fails with "Primitive dynamic_slice
    requires varying manual axes to match" — re-test at each jax
    upgrade and drop when fixed). Replication
    safety off-TPU is still covered by test_sharding.py::
    test_sharded_fused_solver_matches_local (bit-exact vs local fused)
    and the type-level threading by the trace-only check_vma test.
    """
    from ilqr_tpu.fused import solve_batch_fused

    mesh = make_mesh() if mesh is None else mesh
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    check_vma = not interpret
    cfg_k = cfg.with_vma_axes((BATCH_AXIS,)) if check_vma else cfg

    def local_solve(params, dt, x0, u0):
        if x0.shape[0] > 1024:
            raise ValueError(
                "per-device shard must be <= 1024 for the sharded fused "
                f"solver; got {x0.shape[0]} (mesh size {mesh.size})")
        if check_vma:
            from ilqr_tpu.utils.vma import vary

            # params/dt are replicated; the kernels consume them mixed
            # with varying problem data (fine), but the jnp glue between
            # kernels wants uniform vma — promote up front.
            params, dt = vary((params, dt), (BATCH_AXIS,))
        return solve_batch_fused(model, params, cfg_k, dt, x0, u0,
                                 interpret=interpret)

    fn = _shard_map()(
        local_solve,
        mesh=mesh,
        in_specs=(P(), P(), P(BATCH_AXIS), P(BATCH_AXIS)),
        out_specs=P(BATCH_AXIS),
        check_vma=check_vma,
    )
    batch_spec = NamedSharding(mesh, P(BATCH_AXIS))
    jitted = jax.jit(fn)

    def run(params, dt, x0, u0) -> Solution:
        _check_divisible(x0.shape[0], mesh)
        x0 = jax.device_put(x0, batch_spec)
        u0 = jax.device_put(u0, batch_spec)
        return jitted(params, jnp.asarray(dt), x0, u0)

    run.jitted = jitted  # exposed for lowering/HLO inspection (benchmarks)
    return run


def make_sharded_fused_warm_solver(
    model: Model,
    cfg: SolverConfig,
    mesh: Optional[Mesh] = None,
    interpret: Optional[bool] = None,
):
    """Sharded twin of ``fused.solve_batch_fused_warm`` — the MPC fleet
    re-plan (ref generate_trajectory warm overload, ilqr_core.cpp:65-76)
    with the fleet's batch axis split over the mesh. Each lane carries its
    own warm payload, so the returned fn maps

        (params, dt, x0 (B,n), us (B,T,m), xs (B,T+1,n), K (B,T,m,n),
         lam (B,), dlam (B,)) -> Solution

    with every warm leaf sharded like x0. B divisible by mesh size;
    per-device shard ≤ 1024 (one kernel block). Shared params only.
    ``check_vma``/interpret semantics exactly as
    :func:`make_sharded_fused_solver` (ON for compiled kernels, OFF in
    interpret mode — jax 0.9 limitation documented there).
    """
    from ilqr_tpu.fused import solve_batch_fused_warm
    from ilqr_tpu.types import Solution

    mesh = make_mesh() if mesh is None else mesh
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    check_vma = not interpret
    cfg_k = cfg.with_vma_axes((BATCH_AXIS,)) if check_vma else cfg

    def local_solve(params, dt, x0, us, xs, K, lam, dlam):
        if x0.shape[0] > 1024:
            raise ValueError(
                "per-device shard must be <= 1024 for the sharded fused "
                f"warm solver; got {x0.shape[0]} (mesh size {mesh.size})")
        if check_vma:
            from ilqr_tpu.utils.vma import vary

            params, dt = vary((params, dt), (BATCH_AXIS,))
        prev = Solution(xs=xs, us=us, k=None, K=K, cost=None, lam=lam,
                        dlam=dlam, iterations=None, reason=None,
                        gnorm=None)
        return solve_batch_fused_warm(model, params, cfg_k, dt, x0, prev,
                                      interpret=interpret)

    fn = _shard_map()(
        local_solve,
        mesh=mesh,
        in_specs=(P(), P()) + (P(BATCH_AXIS),) * 6,
        out_specs=P(BATCH_AXIS),
        check_vma=check_vma,
    )
    batch_spec = NamedSharding(mesh, P(BATCH_AXIS))
    jitted = jax.jit(fn)

    def run(params, dt, x0, us, xs, K, lam, dlam) -> Solution:
        _check_divisible(x0.shape[0], mesh)
        sharded = [jax.device_put(jnp.asarray(a, jnp.float32), batch_spec)
                   for a in (x0, us, xs, K, lam, dlam)]
        return jitted(params, jnp.asarray(dt), *sharded)

    run.jitted = jitted
    return run


def make_sharded_warm_solver(
    model: Model,
    cfg: SolverConfig,
    mesh: Optional[Mesh] = None,
):
    """vmap-path twin of :func:`make_sharded_fused_warm_solver` (the warm
    solve for models/configs outside the fused envelope): ``shard_map``
    of ``vmap(solver.solve_warm)`` with the same
    (params, dt, x0, us, xs, K, lam, dlam) signature."""
    from ilqr_tpu.solver import solve_warm
    from ilqr_tpu.types import Solution

    mesh = make_mesh() if mesh is None else mesh
    cfg_v = cfg.with_vma_axes((BATCH_AXIS,))

    def _one(params, dt, x, us, xs, K, lam, dlam):
        prev = Solution(xs=xs, us=us, k=None, K=K, cost=None, lam=lam,
                        dlam=dlam, iterations=None, reason=None,
                        gnorm=None)
        return solve_warm(model, params, cfg_v, dt, x, prev)

    def local_solve(params, dt, x0, us, xs, K, lam, dlam):
        from ilqr_tpu.utils.vma import vary

        # see make_sharded_solver: promote replicated params/dt so jax's
        # auto-pvary never mis-fires inside vmap(jacfwd(...)).
        params, dt = vary((params, dt), (BATCH_AXIS,))
        return jax.vmap(
            _one, in_axes=(None, None, 0, 0, 0, 0, 0, 0)
        )(params, dt, x0, us, xs, K, lam, dlam)

    fn = _shard_map()(
        local_solve,
        mesh=mesh,
        in_specs=(P(), P()) + (P(BATCH_AXIS),) * 6,
        out_specs=P(BATCH_AXIS),
        check_vma=True,
    )
    batch_spec = NamedSharding(mesh, P(BATCH_AXIS))
    jitted = jax.jit(fn)

    def run(params, dt, x0, us, xs, K, lam, dlam) -> Solution:
        _check_divisible(x0.shape[0], mesh)
        sharded = [jax.device_put(jnp.asarray(a), batch_spec)
                   for a in (x0, us, xs, K, lam, dlam)]
        return jitted(params, jnp.asarray(dt), *sharded)

    run.jitted = jitted
    return run


def sharded_convergence_stats(model: Model, cfg: SolverConfig, mesh: Mesh,
                              params_batched: bool = False):
    """Solve + on-device reduction of convergence stats via collectives.

    Demonstrates the only communication this workload needs: a ``psum``/
    ``pmax`` over the batch axis (inside ``shard_map``) to aggregate cost and
    convergence counters without gathering trajectories to the host.
    """
    shard_map = _shard_map()
    cfg_v = cfg.with_vma_axes((BATCH_AXIS,))

    def local_solve_and_reduce(params, dt, x0, u0):
        from ilqr_tpu.utils.vma import vary

        # see make_sharded_solver: promote replicated inputs up front so
        # jax's auto-pvary never mis-fires inside vmap(jacfwd(...)).
        params, dt = vary((params, dt), (BATCH_AXIS,))
        in_axes = (0 if params_batched else None, None, 0, 0)
        sol = jax.vmap(
            lambda p, d, x, u: solve(model, p, cfg_v, d, x, u),
            in_axes=in_axes,
        )(params, dt, x0, u0)
        n_local = jnp.asarray(sol.cost.shape[0], jnp.float32)
        stats = {
            "sum_cost": jnp.sum(sol.cost),
            "max_cost": jnp.max(sol.cost),
            "sum_iters": jnp.sum(sol.iterations.astype(jnp.float32)),
            "n": n_local,
        }
        # Cross-shard reduction rides ICI: the only collectives in the system.
        total = {
            "sum_cost": jax.lax.psum(stats["sum_cost"], BATCH_AXIS),
            "max_cost": jax.lax.pmax(stats["max_cost"], BATCH_AXIS),
            "sum_iters": jax.lax.psum(stats["sum_iters"], BATCH_AXIS),
            "n": jax.lax.psum(stats["n"], BATCH_AXIS),
        }
        return {
            "mean_cost": total["sum_cost"] / total["n"],
            "max_cost": total["max_cost"],
            "mean_iters": total["sum_iters"] / total["n"],
            "n": total["n"],
        }

    p_spec = P(BATCH_AXIS) if params_batched else P()
    fn = shard_map(
        local_solve_and_reduce,
        mesh=mesh,
        in_specs=(p_spec, P(), P(BATCH_AXIS), P(BATCH_AXIS)),
        out_specs=P(),
        check_vma=True,
    )
    return jax.jit(fn)
