"""Microbatching solver service: the production-serving front end.

The reference is a library wired into one process — `main.cpp` builds one
problem, calls `iLQR::solve`, writes a CSV (ref: src/ilqr_main.cpp). A TPU
deployment looks different: many concurrent clients (e.g. MPC controllers,
planners, RL actors) each need one solve at a time, while the economics of
the chip are dominated by two fixed costs:

- the host dispatch + device→host round trip (~26 ms on the axon tunnel,
  BENCH_NOTES.md cost model) — paid once per *dispatch*, not per problem;
- the fused solver's single compiled 1024-lane block program (fused.py) —
  a one-lane solve and a 1024-lane solve cost the same device time.

So the way to serve individual requests at high throughput is to coalesce
them: queue incoming (x0, u0) pairs, wait at most `max_wait_ms` after the
first arrival, stack up to `max_batch` of them into ONE batched solve on
the fused TPU path (or a fixed-shape jitted `vmap(solve)` off-TPU), and
scatter the per-lane Solutions back to the callers' futures.

Shape discipline (critical on the axon backend, where every new program is
a 10-600 s remote compile): the service fixes (model, params, cfg, dt, T)
at construction AND pads every dispatch to `max_batch` lanes, so exactly
one shape ever reaches the device on either path. The fused block program
is internally shape-fixed, but its host-side pad/pack glue is per-B eager
jnp — measured on TPU, letting B vary cost 3.8 s/batch in fresh remote
compiles of those tiny programs (p99 latency 97 s) vs the ~0.27 s fixed-
shape block solve (BENCH_NOTES round 4).

Measured end state on one v5e chip (BENCH_NOTES round 4, rows
serve_packed* / lane_probe*): with max_batch sized to the burst (256), a
single request is 83 ms and open-loop load is absorbed at 358 req/s
with p50 141 ms / p99 272 ms and zero errors; per-batch time equals the
pure block-solve device time. Per-request results are bitwise
independent of whatever they are co-batched with, across processes and
AOT executable reloads.

Usage::

    svc = SolverService(model, params, cfg, dt=0.02, horizon=199)
    fut = svc.submit(x0)              # concurrent.futures.Future
    sol = fut.result()                # per-request Solution (no batch axis)
    svc.close()

or as a context manager. Thread-safe; any solver exception is propagated
to every future in the failing batch.
"""

from __future__ import annotations

import functools
import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ilqr_tpu.config import SolverConfig
from ilqr_tpu.models.base import Model
from ilqr_tpu.types import Solution


@dataclass
class _Request:
    x0: np.ndarray          # (n,)
    u0: Optional[np.ndarray]  # (T, m); None on resident services
    # warm-start payload (warm services): (us, xs, K, lam, dlam) numpy
    # leaves of the client's previous Solution, or None for a cold lane
    prev: Optional[tuple] = None
    # resident services: the controller's device-state slot id
    slot: Optional[int] = None
    future: Future = field(default_factory=Future)


_SHUTDOWN = object()


def build_dispatch(model, params, cfg, dt, horizon, max_batch, *,
                   path, warm=False, fields=None, pack=True):
    """Construct the fixed-shape serving dispatch program shared by
    :class:`SolverService` and ``ilqr_tpu.aot.compile_solver``.

    Returns ``(fn, dmeta)``:
      - when the program is *packable* (all 32-bit leaves, fused block
        fits), ``fn(flat)->flat`` maps ONE flat f32 input array (every
        dispatch input raveled+concatenated) to ONE flat f32 output
        array (the selected Solution leaves, i32 bitcast through f32) —
        one H2D and one D2H transfer per dispatch (~26 ms per transfer
        on the TPU tunnel otherwise), and ``dmeta`` carries the
        serializable layout: ``in_specs``/``out_specs`` as
        (shape, dtype-str) lists plus ``fields``/``warm``;
      - otherwise ``fn(*arrays)->Solution`` with ``dmeta['packed']=False``.

    Input order: ``(x0, u0)`` cold; ``(x0, us, xs, K, lam, dlam)`` warm.
    Use :func:`unpack_dispatch_output` to rebuild the Solution tree.
    """
    import numpy as _np

    T, n, m, mb = int(horizon), model.n, model.m, int(max_batch)
    eager = False  # set on the chunked-dispatch route below

    if warm and path == "fused":
        from ilqr_tpu.fused import fused_applicable, solve_batch_fused_warm

        if not fused_applicable(model, cfg):
            raise ValueError(
                "path='fused' warm dispatch: model/config not "
                "fused-compatible (see fused.fused_applicable)")

        def raw(x0b, usb, xsb, Kb, lamb, dlamb):
            prev = Solution(
                xs=xsb, us=usb, k=None, K=Kb, cost=None, lam=lamb,
                dlam=dlamb, iterations=None, reason=None, gnorm=None)
            return solve_batch_fused_warm(model, params, cfg, dt,
                                          x0b, prev)
    elif warm:
        from ilqr_tpu.ops.rollout import MAX_STAGE_KERNEL_M
        from ilqr_tpu.solver import solve_warm

        if (jax.default_backend() == "tpu"
                and model.m > MAX_STAGE_KERNEL_M):
            raise ValueError(
                f"warm vmap serving with m={model.m} > "
                f"{MAX_STAGE_KERNEL_M} on TPU would compile a monolithic "
                "while_loop program in the region that can crash the TPU "
                "worker (BENCH_NOTES round 5) and has no chunked warm "
                "dispatch yet; serve cold (iteration-chunked) or use a "
                "fused-capable model")

        def _one_warm(x, us, xs, K, lam, dlam):
            prev = Solution(xs=xs, us=us, k=None, K=K, cost=None,
                            lam=lam, dlam=dlam, iterations=None,
                            reason=None, gnorm=None)
            return solve_warm(model, params, cfg, dt, x, prev)

        def raw(*a):
            return jax.vmap(_one_warm)(*a)
    elif path == "fused":
        from ilqr_tpu.fused import fused_applicable, solve_batch_fused
        from ilqr_tpu.ops.pallas_sweep import MAX_FUSED_M

        # Fail fast: consult solve_batch_fused's own applicability check
        # so misconfiguration errors at construction, not per-batch.
        if not fused_applicable(model, cfg):
            if model.m > MAX_FUSED_M:
                raise ValueError(
                    f"path='fused' requires model.m <= {MAX_FUSED_M}, "
                    f"got m={model.m}; use path='vmap'")
            if not model.has_soa:
                raise ValueError(
                    "path='fused' requires a model with SoA functions "
                    "(models/base.py); use path='vmap'")
            raise ValueError(
                "this SolverConfig is not fused-compatible (full_ddp, "
                "sweep_kernel, or boxqp_mode — see "
                "fused.fused_applicable); use path='vmap'")

        raw = functools.partial(solve_batch_fused, model, params, cfg, dt)
    else:
        from ilqr_tpu.ops.rollout import MAX_STAGE_KERNEL_M
        from ilqr_tpu.solver import solve

        if (jax.default_backend() == "tpu"
                and model.m > MAX_STAGE_KERNEL_M):
            # the monolithic vmapped while_loop program can crash the
            # TPU worker in this region (BENCH_NOTES round 5) — dispatch
            # eagerly through the fully-contained wide-m solve instead
            # (batch.solve_batch_wide: iteration+batch chunking and the
            # per-process work ledger; once the ledger is exhausted
            # dispatches raise — recycle the serving process). No
            # packing (a host loop is not one jittable program). The
            # dispatches pad to MAX_WIDE_DISPATCH_B multiples (not
            # max_batch) so small batches don't burn the scarce ledger,
            # and an impossible configuration fails HERE, at
            # construction, not on the first request.
            from ilqr_tpu.batch import (
                MAX_WIDE_DISPATCH_B,
                _wide_m_budget,
                solve_batch_wide,
            )

            budget = _wide_m_budget()
            # the smallest possible dispatch pads to min(max_batch,
            # MAX_WIDE_DISPATCH_B) lanes (see _solve's pad_multiple
            # rounding) — a 64-slot fleet spends 64 x max_iter per
            # batch, not 256 x max_iter
            min_lanes = min(mb, MAX_WIDE_DISPATCH_B)
            min_work = min_lanes * int(cfg.max_iter)
            if min_work > budget:
                raise ValueError(
                    f"wide-m serving (m={model.m} > "
                    f"{MAX_STAGE_KERNEL_M}) needs at least one "
                    f"{min_lanes}-lane dispatch x max_iter="
                    f"{cfg.max_iter} = {min_work} lane-iterations per "
                    f"batch, but the per-process worker-fault budget is "
                    f"{budget} (BENCH_NOTES round 5) — lower max_iter, "
                    "or raise ILQR_TPU_WIDE_M_BUDGET after probing")
            if mb > MAX_WIDE_DISPATCH_B and mb % MAX_WIDE_DISPATCH_B:
                # every dispatch must be one of the pre-compiled shapes
                # (multiples of MAX_WIDE_DISPATCH_B, sliced into
                # MAX_WIDE_DISPATCH_B-lane chunks); a ragged max_batch
                # would let a near-full batch dispatch a NEW tail shape
                # and pay a 10-600 s remote compile inside a live
                # request (the round-4 compile-storm failure mode)
                raise ValueError(
                    f"wide-m serving requires max_batch <= "
                    f"{MAX_WIDE_DISPATCH_B} or a multiple of it, got "
                    f"max_batch={mb}")

            def raw(x, u):
                return solve_batch_wide(model, params, cfg, dt, x, u)

            eager = True
        else:
            def raw(x, u):
                return jax.vmap(
                    lambda a, b: solve(model, params, cfg, dt, a, b))(x, u)

    if warm:
        in_shapes = [(mb, n), (mb, T, m), (mb, T + 1, n), (mb, T, m, n),
                     (mb,), (mb,)]
    else:
        in_shapes = [(mb, n), (mb, T, m)]
    in_s = [jax.ShapeDtypeStruct(sh, jnp.float32) for sh in in_shapes]

    def select(sol):
        if fields is None:
            return sol
        return Solution(*[
            (getattr(sol, f) if f in fields else None)
            for f in Solution._fields])

    dmeta = {"packed": False, "warm": bool(warm),
             "fields": None if fields is None else tuple(fields),
             "in_specs": [(sh, "float32") for sh in in_shapes]}
    if eager:
        # host-driven chunked dispatch: must run EAGERLY (never jitted,
        # never AOT-compiled — it is a host loop over device programs).
        # pad_multiple: dispatches pad to 256-lane multiples, not
        # max_batch — same compiled sub-batch program, 1/4 the ledger
        # spend for small batches
        from ilqr_tpu.batch import MAX_WIDE_DISPATCH_B

        dmeta["eager"] = True
        dmeta["pad_multiple"] = MAX_WIDE_DISPATCH_B
        return (lambda *a: select(raw(*a))), dmeta
    if not pack:
        return raw, dmeta  # caller opted out (e.g. CPU AOT blobs —
        # XLA:CPU cannot deserialize the packed program, see aot.py)
    if path == "fused" and mb > 1024:
        return raw, dmeta  # host chunk loop — not jittable as one program

    from ilqr_tpu.aot import pack_leaves, pack_specs

    out_s = jax.eval_shape(raw, *in_s)
    specs = pack_specs(select(out_s))
    if specs is None:
        return raw, dmeta  # 64-bit leaves (x64 runs) — unpackable

    in_sizes = [int(_np.prod(sh)) for sh in in_shapes]
    in_splits = list(_np.cumsum(in_sizes)[:-1])

    def fn(flat):
        parts = jnp.split(flat, in_splits)
        args = [p.reshape(sh) for p, sh in zip(parts, in_shapes)]
        return pack_leaves(select(raw(*args)))

    dmeta.update(packed=True, out_specs=specs,
                 flat_in_size=int(sum(in_sizes)))
    return fn, dmeta


def unpack_dispatch_output(flat_np, dmeta):
    """Rebuild the (fields-selected) Solution from a packed dispatch
    output, per the layout recorded by :func:`build_dispatch`."""
    from ilqr_tpu.aot import unpack_flat

    fields = dmeta.get("fields")
    arrs = iter(unpack_flat(flat_np, dmeta["out_specs"]))
    return Solution(*[
        (next(arrs) if fields is None or f in fields else None)
        for f in Solution._fields])


RESIDENT_FIELDS = ("us", "cost", "iterations", "reason")


def build_resident_mesh_dispatch(model, params, cfg, dt, horizon,
                                 max_batch, capacity, mesh, *,
                                 path, fields=None):
    """Multi-device twin of :func:`build_resident_dispatch`: the resident
    fleet's state is SHARDED over the mesh by slot — slot ``s`` lives on
    device ``s % D`` at local index ``s // D`` (plus one scratch slot per
    device for padded lanes), and the service buckets each batch's lanes
    so every lane lands on its slot's device (``SolverService._process``)
    — so the gather/solve/scatter is entirely device-local: ZERO
    cross-device collectives, like every other sharded path here.

    Program (donated sharded state first, all P('batch') on axis 0):

        fn(s_us, s_xs, s_K, s_lam, s_dlam, x0, local_slots, wmask)
            -> (s_us', ..., s_dlam', Solution-selected)

    where ``local_slots`` are already device-LOCAL indices (scratch =
    ``ceil(capacity/D)``). No single-transfer packing under a mesh (same
    rationale as the sharded cold/warm dispatches). Returns
    ``(run, dmeta, init_state)`` where ``run`` is the jitted program and
    ``init_state()`` builds the sharded state arrays.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ilqr_tpu.parallel.mesh import BATCH_AXIS, _shard_map
    from ilqr_tpu.types import Solution as _Sol

    T, n, m = int(horizon), model.n, model.m
    mb, C, D = int(max_batch), int(capacity), int(mesh.size)
    if mb % D:
        raise ValueError(
            f"max_batch={mb} must be divisible by the mesh size {D}")
    mbs = mb // D
    c_loc = -(-C // D)          # slots per device (ceil)
    fields = RESIDENT_FIELDS if fields is None else tuple(fields)
    bad = set(fields) & {"xs", "K", "k"}
    if bad:
        raise ValueError(
            f"resident dispatch cannot return {sorted(bad)} — the warm "
            "trajectory state stays on device")

    interpret = jax.default_backend() != "tpu"
    if path == "fused":
        from ilqr_tpu.fused import fused_applicable, solve_batch_fused_warm

        if not fused_applicable(model, cfg):
            raise ValueError("resident path='fused': model/config not "
                             "fused-compatible")
        if mbs > 1024:
            raise ValueError(
                f"per-device shard {mbs} exceeds the 1024-lane fused "
                "block")
        check_vma = not interpret
        cfg_k = (cfg.with_vma_axes((BATCH_AXIS,)) if check_vma else cfg)

        def local_raw(p, d, x0b, usb, xsb, Kb, lamb, dlamb):
            prev = _Sol(xs=xsb, us=usb, k=None, K=Kb, cost=None,
                        lam=lamb, dlam=dlamb, iterations=None,
                        reason=None, gnorm=None)
            return solve_batch_fused_warm(model, p, cfg_k, d, x0b, prev,
                                          interpret=interpret)
    else:
        from ilqr_tpu.ops.rollout import MAX_STAGE_KERNEL_M
        from ilqr_tpu.solver import solve_warm

        if (jax.default_backend() == "tpu"
                and model.m > MAX_STAGE_KERNEL_M):
            raise ValueError(
                f"resident vmap serving with m={model.m} > "
                f"{MAX_STAGE_KERNEL_M} on TPU would compile the "
                "monolithic while_loop program in the worker-fault "
                "region (BENCH_NOTES round 5) — sharding does not "
                "change that; use a fused-capable model")

        check_vma = True
        cfg_v = cfg.with_vma_axes((BATCH_AXIS,))

        def _one(p, d, x, us, xs, K, lam, dlam):
            prev = _Sol(xs=xs, us=us, k=None, K=K, cost=None, lam=lam,
                        dlam=dlam, iterations=None, reason=None,
                        gnorm=None)
            return solve_warm(model, p, cfg_v, d, x, prev)

        def local_raw(p, d, *a):
            return jax.vmap(
                _one, in_axes=(None, None) + (0,) * 6)(p, d, *a)

    f32 = jnp.float32
    state_shapes = [(D * (c_loc + 1), T, m), (D * (c_loc + 1), T + 1, n),
                    (D * (c_loc + 1), T, m, n), (D * (c_loc + 1),),
                    (D * (c_loc + 1),)]
    bspec = NamedSharding(mesh, P(BATCH_AXIS))

    def init_state():
        s = [jax.device_put(jnp.zeros(sh, f32), bspec)
             for sh in state_shapes[:3]]
        s.append(jax.device_put(
            jnp.full(state_shapes[3], cfg.lambda_init, f32), bspec))
        s.append(jax.device_put(
            jnp.full(state_shapes[4], cfg.dlambda_init, f32), bspec))
        return tuple(s)

    def select(sol):
        return _Sol(*[
            (getattr(sol, f) if f in fields else None)
            for f in _Sol._fields])

    def local_fn(params_, dt_, s_us, s_xs, s_K, s_lam, s_dlam,
                 x0, slots, wmask):
        if check_vma:
            from ilqr_tpu.utils.vma import vary

            params_, dt_ = vary((params_, dt_), (BATCH_AXIS,))
        g_us = s_us[slots]
        g_xs = s_xs[slots]
        g_K = s_K[slots]
        w3 = wmask[:, None, None]
        us_in = g_us * w3
        xs_in = g_xs * w3
        K_in = g_K * wmask[:, None, None, None]
        lam_in = jnp.where(wmask > 0, s_lam[slots],
                           jnp.asarray(cfg.lambda_init, f32))
        dlam_in = jnp.where(wmask > 0, s_dlam[slots],
                            jnp.asarray(cfg.dlambda_init, f32))
        sol = local_raw(params_, dt_, x0, us_in, xs_in, K_in,
                        lam_in, dlam_in)
        new = (s_us.at[slots].set(sol.us),
               s_xs.at[slots].set(sol.xs),
               s_K.at[slots].set(sol.K),
               s_lam.at[slots].set(sol.lam),
               s_dlam.at[slots].set(sol.dlam))
        return new + (select(sol),)

    P_b = P(BATCH_AXIS)
    fn = _shard_map()(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P()) + (P_b,) * 8,
        out_specs=(P_b,) * 5 + (P_b,),
        check_vma=check_vma,
    )
    jitted = jax.jit(fn, donate_argnums=(2, 3, 4, 5, 6))

    def run(state, x0, local_slots, wmask):
        args = [jax.device_put(jnp.asarray(a), bspec)
                for a in (x0, local_slots, wmask)]
        out = jitted(params, jnp.asarray(dt), *state, *args)
        return out[:5], out[5]

    dmeta = {"packed": False, "resident": True, "warm": True,
             "mesh": True, "fields": fields, "capacity": C,
             "slots_per_device": c_loc, "devices": D,
             "per_device_lanes": mbs,
             "state_shapes": [(tuple(sh), "float32")
                              for sh in state_shapes]}
    run.jitted = jitted          # for AOT compilation (aot.py)
    run.fn = fn                  # the un-jitted shard_map program
    run.bspec = bspec
    return run, dmeta, init_state


def build_resident_dispatch(model, params, cfg, dt, horizon, max_batch,
                            capacity, *, path, fields=None):
    """The DEVICE-RESIDENT warm fleet dispatch (round 5): per-controller
    MPC state (us, xs, K, λ, dλ) lives in ``capacity`` device-side slots
    and never round-trips the host, so a warm replan's H2D payload is
    just (x0, slot, warm-flag) — ~20 bytes/lane instead of the ~15 KB
    warm pytree. Semantically this is the reference's MPC warm-start
    overload (ref ilqr_core.cpp:65-76 — reuse the previous controls and
    gains, λ/dλ carried) scaled to a fleet whose "previous solve" state
    is owned by the device, the way the reference's file-scope λ statics
    (include/ilqr.h:17-18) made its single solver instance stateful.
    Measured motivation (BENCH_NOTES round 5): the full-block warm
    dispatch is TRANSFER-bound (device time ~2 ms of a ~0.45 s
    dispatch), and the axon client leaks host RSS per H2D transfer
    proportional to its size — the resident layout attacks both.

    Program signature (donated state first):

        fn(s_us, s_xs, s_K, s_lam, s_dlam, flat_in)
            -> (s_us', s_xs', s_K', s_lam', s_dlam', flat_out)

    where ``flat_in`` packs (x0 (B,n) f32, slots (B,) i32 bitcast,
    warm_mask (B,) f32) and ``flat_out`` packs the ``fields``-selected
    Solution leaves (default :data:`RESIDENT_FIELDS` — NOT xs/K; those
    stay on device). State buffers have ``capacity + 1`` slots: the last
    is scratch for padded lanes. Cold lanes (warm_mask 0) synthesize the
    u0=0, K=0, λ_init payload in-program — bit-identical to a cold solve
    with zero initial controls. Returns ``(fn, dmeta, init_state)``.
    """
    import numpy as _np

    T, n, m = int(horizon), model.n, model.m
    mb, C = int(max_batch), int(capacity)
    fields = RESIDENT_FIELDS if fields is None else tuple(fields)
    bad = set(fields) & {"xs", "K", "k"}
    if bad:
        raise ValueError(
            f"resident dispatch cannot return {sorted(bad)} — the warm "
            "trajectory state stays on device (that is the point); "
            "request us/cost/iterations/reason/lam/dlam/gnorm")

    if path == "fused":
        from ilqr_tpu.fused import fused_applicable, solve_batch_fused_warm

        if not fused_applicable(model, cfg):
            raise ValueError(
                "resident path='fused': model/config not fused-compatible "
                "(see fused.fused_applicable)")
        if mb > 1024:
            raise ValueError(
                f"resident path='fused' requires max_batch <= 1024 (one "
                "kernel block: the resident program is jitted as a whole, "
                "and jitting solve_batch_fused_warm's host chunk loop is "
                f"forbidden — fused.py); got max_batch={mb}. Lower "
                "max_batch or shard the fleet with mesh=")

        def raw(x0b, usb, xsb, Kb, lamb, dlamb):
            prev = Solution(xs=xsb, us=usb, k=None, K=Kb, cost=None,
                            lam=lamb, dlam=dlamb, iterations=None,
                            reason=None, gnorm=None)
            return solve_batch_fused_warm(model, params, cfg, dt,
                                          x0b, prev)
    else:
        from ilqr_tpu.ops.rollout import MAX_STAGE_KERNEL_M
        from ilqr_tpu.solver import solve_warm

        if (jax.default_backend() == "tpu"
                and model.m > MAX_STAGE_KERNEL_M):
            raise ValueError(
                "resident vmap serving is unsupported for "
                f"m > {MAX_STAGE_KERNEL_M} on TPU (worker-fault region, "
                "BENCH_NOTES round 5)")

        def _one(x, us, xs, K, lam, dlam):
            prev = Solution(xs=xs, us=us, k=None, K=K, cost=None,
                            lam=lam, dlam=dlam, iterations=None,
                            reason=None, gnorm=None)
            return solve_warm(model, params, cfg, dt, x, prev)

        def raw(*a):
            return jax.vmap(_one)(*a)

    f32 = jnp.float32
    state_shapes = [(C + 1, T, m), (C + 1, T + 1, n), (C + 1, T, m, n),
                    (C + 1,), (C + 1,)]

    def init_state():
        s = [jnp.zeros(sh, f32) for sh in state_shapes[:3]]
        s.append(jnp.full((C + 1,), cfg.lambda_init, f32))
        s.append(jnp.full((C + 1,), cfg.dlambda_init, f32))
        return tuple(s)

    def select(sol):
        return Solution(*[
            (getattr(sol, f) if f in fields else None)
            for f in Solution._fields])

    from ilqr_tpu.aot import pack_leaves, pack_specs

    in_sizes = [mb * n, mb, mb]

    def fn(s_us, s_xs, s_K, s_lam, s_dlam, flat_in):
        parts = jnp.split(flat_in, list(_np.cumsum(in_sizes)[:-1]))
        x0 = parts[0].reshape(mb, n)
        slots = jax.lax.bitcast_convert_type(parts[1], jnp.int32)
        wmask = parts[2]
        g_us = s_us[slots]
        g_xs = s_xs[slots]
        g_K = s_K[slots]
        # cold lanes: us=0 (open-loop u0=0), K=0 → the rollout reduces to
        # the cold init_traj; λ/dλ at their cold inits
        w3 = wmask[:, None, None]
        us_in = g_us * w3
        xs_in = g_xs * w3
        K_in = g_K * wmask[:, None, None, None]
        lam_in = jnp.where(wmask > 0, s_lam[slots],
                           jnp.asarray(cfg.lambda_init, f32))
        dlam_in = jnp.where(wmask > 0, s_dlam[slots],
                            jnp.asarray(cfg.dlambda_init, f32))
        sol = raw(x0, us_in, xs_in, K_in, lam_in, dlam_in)
        new = (s_us.at[slots].set(sol.us),
               s_xs.at[slots].set(sol.xs),
               s_K.at[slots].set(sol.K),
               s_lam.at[slots].set(sol.lam),
               s_dlam.at[slots].set(sol.dlam))
        return new + (pack_leaves(select(sol)),)

    raw_in = [jax.ShapeDtypeStruct((mb, n), f32),
              jax.ShapeDtypeStruct((mb, T, m), f32),
              jax.ShapeDtypeStruct((mb, T + 1, n), f32),
              jax.ShapeDtypeStruct((mb, T, m, n), f32),
              jax.ShapeDtypeStruct((mb,), f32),
              jax.ShapeDtypeStruct((mb,), f32)]
    out_specs = pack_specs(select(jax.eval_shape(raw, *raw_in)))
    if out_specs is None:
        raise ValueError("resident dispatch requires 32-bit Solution "
                         "leaves (f32 solves; x64 is unsupported here)")
    dmeta = {"packed": True, "resident": True, "warm": True,
             "fields": fields, "capacity": C,
             "in_specs": [((mb, n), "float32"), ((mb,), "int32"),
                          ((mb,), "float32")],
             "state_shapes": [(tuple(sh), "float32")
                              for sh in state_shapes],
             "out_specs": out_specs,
             "flat_in_size": int(sum(in_sizes))}
    return fn, dmeta, init_state




def _validate_blob_problem(aot, model, dt, cfg, params):
    """Blob↔service problem checks EVERY ``aot=`` route must run: the
    executable bakes in the model dynamics, dt, and the whole
    SolverConfig + params values — shape/topology checks alone would let
    a mismatched blob silently serve wrong solutions (ADVICE r4). Kept in
    one place because the round-5 review caught the resident+mesh route
    re-implementing the checks and dropping the dt/model/max_iter leg."""
    from ilqr_tpu.aot import problem_digest

    for key, want in (("model", getattr(model, "name", None)),
                      ("dt", float(dt)),
                      ("max_iter", int(cfg.max_iter))):
        got = aot.meta.get(key)
        if got is not None and got != want:
            raise ValueError(
                f"AOT executable was compiled with {key}={got!r} but the "
                f"service was constructed with {want!r}; recompile with "
                "aot.compile_solver for this configuration")
    # Deep check: params VALUES (goal, weights, limits) and the full
    # SolverConfig, via digest. Legacy blobs (round 4, pre-digest) skip.
    blob_digest = aot.meta.get("problem_digest")
    if (blob_digest is not None
            and blob_digest != problem_digest(params, cfg)):
        raise ValueError(
            "AOT executable was compiled for different params or "
            "SolverConfig than this service was constructed with "
            "(problem_digest mismatch) — the blob bakes those values "
            "into the program; recompile with aot.compile_solver(model, "
            "params, cfg, ...) for exactly this configuration")


class SolverService:
    """Coalesce single-problem solve requests into batched device solves.

    Args:
      model, params, cfg, dt: as for ``ilqr_tpu.solver.solve`` — fixed for
        the service's lifetime (one compiled program per path).
      horizon: trajectory length T; every request's ``u0`` must be (T, m).
      max_batch: coalescing cap per dispatch. On the vmap path this is
        also the padded compile-time batch size. Sizing note: every
        dispatch pads to — and fetches — exactly ``max_batch`` lanes,
        so the per-dispatch D2H payload scales with it while the fused
        device time does not (the kernel always runs a 1024-lane
        block). Size it to your expected coalesced burst: a service
        seeing ≤100 concurrent requests is lower-latency at
        ``max_batch=256`` than at the default 1024 (~4× less D2H),
        with capacity capped at 256 lanes/dispatch.
      max_wait_ms: how long the worker waits after the FIRST queued
        request for more to coalesce. 0 disables waiting (each dispatch
        takes whatever is queued at that instant).
      path: 'auto' (fused on TPU, vmap elsewhere), 'fused', or 'vmap'.
      mesh: a ``jax.sharding.Mesh`` — the service then dispatches every
        padded batch through the SHARDED solver (``parallel.mesh.
        make_sharded_fused_solver`` / ``make_sharded_solver``), splitting
        ``max_batch`` lanes across the mesh devices (data parallel, zero
        cross-device collectives in the hot loop). ``max_batch`` must be
        divisible by the mesh size; on the fused path each device's shard
        (``max_batch / mesh.size``) must be ≤ 1024. Combinable with
        ``aot=`` when the blob was compiled with
        ``compile_solver(..., mesh=...)`` over an equal mesh (topology
        is baked into the executable; mismatches are refused). The
        single-transfer D2H packing is skipped under a mesh (the gather
        happens at fetch).
      aot: an ``ilqr_tpu.aot.AotSolver`` (or a path to one saved with
        ``AotSolver.save``) compiled at exactly ``(max_batch, horizon)``
        — the service then dispatches through the pre-compiled
        executable and NEVER traces/compiles, so it serves its first
        request ~3.5 s after construction instead of paying the
        200-300 s lowering tax on the TPU tunnel (BENCH_NOTES round 4,
        aot_save/aot_load). The padded dispatch shape matches the AOT
        shape pin by construction.
      fields: optional tuple of Solution field names (e.g. ``("us",
        "cost", "iterations")``) — the dispatch program then computes
        its packed D2H transfer from ONLY those leaves, shrinking the
        per-dispatch payload (an MPC client that only consumes ``us``
        cuts the fetch ~5×); unrequested fields come back as ``None``
        in each per-request Solution. Bandwidth savings apply on the
        packed path (no mesh/aot/64-bit leaves); elsewhere the filter
        is applied host-side for API consistency.
      warm: compile the WARM-start program instead (ref MPC overload,
        ilqr_core.cpp:65-76): every dispatch takes per-lane
        (us, xs, K, lam, dlam) from each request's ``prev`` Solution
        (``submit(x0, prev=last_solution)``), and lanes without a prev
        solve cold via a synthesized K=0/λ_init payload that is
        bit-identical to the cold path. One program either way.
        Combinable with ``aot=`` (a blob compiled with
        ``compile_solver(..., warm=True)``) and with ``mesh=`` (the
        fleet's lanes are then split across the mesh devices).
      resident_slots: with ``warm=True``, allocate this many DEVICE-SIDE
        controller state slots and serve the fleet without ever
        round-tripping the warm pytree through the host: clients call
        ``submit(x0, slot=i)``; the first request per slot solves cold
        (zero initial controls), later ones warm-start from the slot's
        resident (us, xs, K, λ, dλ). Each dispatch's H2D payload is just
        (x0, slot, warm-flag) — ~20 B/lane vs ~15 KB/lane for ``prev=``
        serving — and the D2H payload is the ``fields`` selection
        (default ``RESIDENT_FIELDS``; xs/K stay on device). Motivated by
        round-5 measurements: full-block warm dispatches are
        transfer-bound and the axon client leaks host RSS per transfer
        byte. State buffers cost ``(capacity+1) × ~(T·(m·n+m+n)+2)``
        floats of HBM (~7.3 KB/slot at the acrobot serve shape).
        Combinable with ``aot=`` (a blob from ``compile_solver(...,
        resident_slots=capacity)``) or with ``mesh=`` (the state shards
        over the mesh by slot — slot ``s`` on device ``s % D`` — and the
        service buckets each batch's lanes onto their slots' devices, so
        the gather/solve/scatter stays device-local with zero
        collectives; bucket overflow defers to the next dispatch like
        duplicate slots do). All three compose: ``compile_solver(...,
        resident_slots=C, mesh=mesh)`` serializes the sharded
        donated-state program and ``SolverService(resident_slots=C,
        mesh=mesh, aot=blob)`` validates and loads it.
      autostart: start the worker thread (tests drive ``_run_once``
        directly with ``autostart=False``).
    """

    def __init__(self, model: Model, params, cfg: SolverConfig, dt: float,
                 horizon: int, *, max_batch: int = 1024,
                 max_wait_ms: float = 2.0, path: str = "auto",
                 mesh=None, aot=None, fields=None, warm: bool = False,
                 resident_slots: int = 0, autostart: bool = True):
        if fields is not None:
            bad = set(fields) - set(Solution._fields)
            if bad:
                raise ValueError(
                    f"unknown Solution fields {sorted(bad)}; valid: "
                    f"{Solution._fields}")
            fields = tuple(fields)
        if path not in ("auto", "fused", "vmap"):
            raise ValueError(f"unknown path {path!r}")
        if path == "auto":
            path = "fused" if jax.default_backend() == "tpu" else "vmap"
        self.warm = bool(warm)
        self.resident = int(resident_slots)
        if self.resident:
            if not warm:
                raise ValueError(
                    "resident_slots requires warm=True (the resident "
                    "fleet IS the warm-serving mode)")
            if fields is None:
                fields = RESIDENT_FIELDS
        if mesh is not None:
            if max_batch % mesh.size:
                raise ValueError(
                    f"max_batch={max_batch} must be divisible by the mesh "
                    f"size {mesh.size}")
            if path == "fused" and max_batch // mesh.size > 1024:
                raise ValueError(
                    f"per-device shard {max_batch // mesh.size} exceeds "
                    "the 1024-lane fused block; lower max_batch or use "
                    "more devices")
        self._model = model
        self._params = params
        self._cfg = cfg
        self._dt = float(dt)
        self._T = int(horizon)
        self._max_batch = int(max_batch)
        self._max_wait_s = float(max_wait_ms) / 1e3
        self.path = path
        self._pack = None
        self._pack_inputs = False
        self._pad_multiple = None
        self._res_state = None
        self._res_dmeta = None
        self._res_init = None
        self._res_run = None
        self._res_mesh = mesh if (self.resident and mesh is not None) \
            else None
        self._slot_used = None

        if self.resident and mesh is not None:
            run, dmeta, init_state = build_resident_mesh_dispatch(
                model, params, cfg, dt, self._T, self._max_batch,
                self.resident, mesh, path=path, fields=fields)
            fields = dmeta["fields"]
            inner = None  # dispatch goes through self._res_run
            if aot is not None:
                # sharded resident blob: swap the freshly-built program
                # for the deserialized executable (same layout — the
                # builder's dmeta defines it; validate the blob matches)
                from ilqr_tpu.aot import AotSolver
                from ilqr_tpu.aot import load as aot_load

                if isinstance(aot, str):
                    aot = aot_load(aot)
                if not isinstance(aot, AotSolver):
                    raise TypeError("aot must be an AotSolver or a "
                                    "saved-executable path")
                bm = aot.meta.get("dispatch") or {}
                blob_mesh = aot.meta.get("mesh")
                if not (bm.get("resident") and bm.get("mesh")):
                    raise ValueError(
                        "this AOT blob is not a sharded resident program"
                        " — recompile with compile_solver(..., "
                        "resident_slots=..., mesh=...)")
                if (blob_mesh is None
                        or int(blob_mesh["size"]) != mesh.size
                        or tuple(blob_mesh["axes"]) != tuple(mesh.axis_names)
                        or tuple(blob_mesh["shape"])
                        != tuple(mesh.devices.shape)):
                    raise ValueError(
                        f"AOT blob mesh {blob_mesh} does not match the "
                        f"service mesh {tuple(mesh.devices.shape)}")
                for key, want in (("capacity", self.resident),
                                  ("fields", tuple(fields)),
                                  ("per_device_lanes",
                                   self._max_batch // mesh.size)):
                    got_b = bm.get(key)
                    got_b = (tuple(got_b) if isinstance(got_b, list)
                             else got_b)
                    if got_b != want:
                        raise ValueError(
                            f"AOT resident blob {key}={got_b!r} but the "
                            f"service needs {want!r}")
                if tuple(aot.meta["x0_shape"]) != (self._max_batch,
                                                   model.n):
                    raise ValueError(
                        f"AOT blob x0 pin {aot.meta['x0_shape']} != "
                        f"({self._max_batch}, {model.n})")
                _validate_blob_problem(aot, model, dt, cfg, params)
                compiled = aot.compiled
                bspec = run.bspec

                def run_aot(state, x0, local_slots, wmask):
                    args = [jax.device_put(jnp.asarray(a), bspec)
                            for a in (x0, local_slots, wmask)]
                    out = compiled(*state, *args)
                    return out[:5], out[5]

                run = run_aot
            self._res_run = run
            self._res_dmeta = dmeta
            self._res_init = init_state
            self._slot_used = np.zeros(self.resident, bool)
        elif self.resident and aot is None:
            fn, dmeta, init_state = build_resident_dispatch(
                model, params, cfg, dt, self._T, self._max_batch,
                self.resident, path=path, fields=fields)
            fields = dmeta["fields"]
            inner = jax.jit(fn, donate_argnums=(0, 1, 2, 3, 4))
            self._res_dmeta = dmeta
            self._res_init = init_state
            self._slot_used = np.zeros(self.resident, bool)
        elif aot is not None:
            from ilqr_tpu.aot import AotSolver
            from ilqr_tpu.aot import load as aot_load

            if isinstance(aot, str):
                aot = aot_load(aot)
            if not isinstance(aot, AotSolver):
                raise TypeError(
                    "aot must be an AotSolver or a saved-executable path")
            exp = (self._max_batch, model.n)
            got = tuple(aot.meta["x0_shape"])
            if got != exp:
                raise ValueError(
                    f"AOT executable is pinned to x0 {got} but the service "
                    f"dispatches {exp} — recompile with aot.compile_solver("
                    f"..., batch={self._max_batch}, horizon={self._T})")
            if tuple(aot.meta["u0_shape"]) != (self._max_batch, self._T,
                                               model.m):
                raise ValueError(
                    f"AOT executable u0 shape {tuple(aot.meta['u0_shape'])} "
                    f"does not match (max_batch={self._max_batch}, "
                    f"T={self._T}, m={model.m})")
            _validate_blob_problem(aot, model, dt, cfg, params)
            # mesh blobs require a matching mesh=, single-device blobs
            # forbid one — the executable's topology is baked in.
            blob_mesh = aot.meta.get("mesh")
            if blob_mesh is None and mesh is not None:
                raise ValueError(
                    "mesh= with a single-device AOT blob; recompile with "
                    "aot.compile_solver(..., mesh=mesh) for the sharded "
                    "dispatch")
            if blob_mesh is not None:
                if mesh is None:
                    raise ValueError(
                        f"this AOT blob is a sharded program over a "
                        f"{blob_mesh['shape']} mesh — pass the matching "
                        "mesh= to the service")
                if (int(blob_mesh["size"]) != mesh.size
                        or tuple(blob_mesh["axes"]) != tuple(mesh.axis_names)
                        or tuple(blob_mesh["shape"])
                        != tuple(mesh.devices.shape)):
                    raise ValueError(
                        f"AOT blob mesh {blob_mesh['shape']} axes="
                        f"{tuple(blob_mesh['axes'])} does not match the "
                        f"service mesh {tuple(mesh.devices.shape)} axes="
                        f"{tuple(mesh.axis_names)}")
            dmeta = aot.meta.get("dispatch")
            if dmeta is not None:
                # dispatch-layout blob: the compiled program IS the
                # service dispatch — warm/fields must match exactly.
                if bool(dmeta.get("warm")) != bool(warm):
                    raise ValueError(
                        f"AOT program warm={dmeta.get('warm')} but the "
                        f"service was constructed with warm={warm}")
                blob_fields = dmeta.get("fields")
                blob_fields = (None if blob_fields is None
                               else tuple(blob_fields))
                if blob_fields != fields:
                    raise ValueError(
                        f"AOT program fields={blob_fields} but the "
                        f"service was constructed with fields={fields}")
                if bool(dmeta.get("resident", False)) != bool(self.resident):
                    raise ValueError(
                        f"AOT program resident={dmeta.get('resident', False)}"
                        f" but the service was constructed with "
                        f"resident_slots={self.resident}")
                if self.resident:
                    if int(dmeta["capacity"]) != self.resident:
                        raise ValueError(
                            f"AOT resident executable has capacity="
                            f"{dmeta['capacity']} slots but the service "
                            f"was constructed with resident_slots="
                            f"{self.resident}")
                    inner = aot.compiled  # (*state, flat) -> (*state, flat)
                    self._res_dmeta = dmeta
                    cfg_ = cfg

                    def _init_from_meta():
                        shapes = [tuple(sh)
                                  for sh, _ in dmeta["state_shapes"]]
                        s = [jnp.zeros(sh, jnp.float32)
                             for sh in shapes[:3]]
                        s.append(jnp.full(shapes[3], cfg_.lambda_init,
                                          jnp.float32))
                        s.append(jnp.full(shapes[4], cfg_.dlambda_init,
                                          jnp.float32))
                        return tuple(s)

                    self._res_init = _init_from_meta
                    self._slot_used = np.zeros(self.resident, bool)
                elif dmeta["packed"]:
                    inner = aot.compiled  # flat -> flat, zero compiles
                    self._pack = functools.partial(
                        unpack_dispatch_output, dmeta=dmeta)
                    self._pack_inputs = True
                else:
                    inner = aot  # positional arrays -> Solution
            else:
                if warm:
                    raise ValueError(
                        "warm=True needs an AOT blob compiled with "
                        "compile_solver(..., warm=True) (this one is a "
                        "legacy cold blob)")
                inner = aot
        elif mesh is not None:
            if path == "fused":
                from ilqr_tpu.ops.pallas_sweep import MAX_FUSED_M
                from ilqr_tpu.parallel.mesh import (
                    make_sharded_fused_solver,
                    make_sharded_fused_warm_solver,
                )

                if model.m > MAX_FUSED_M:
                    raise ValueError(
                        f"path='fused' requires model.m <= {MAX_FUSED_M}")
                if not model.has_soa:
                    raise ValueError(
                        "path='fused' requires model SoA functions")
                run = (make_sharded_fused_warm_solver(model, cfg, mesh)
                       if warm else
                       make_sharded_fused_solver(model, cfg, mesh))
            else:
                from ilqr_tpu.ops.rollout import MAX_STAGE_KERNEL_M
                from ilqr_tpu.parallel.mesh import (
                    make_sharded_solver,
                    make_sharded_warm_solver,
                )

                if (jax.default_backend() == "tpu"
                        and model.m > MAX_STAGE_KERNEL_M):
                    raise ValueError(
                        f"sharded vmap serving with m={model.m} > "
                        f"{MAX_STAGE_KERNEL_M} on TPU would compile the "
                        "monolithic while_loop program in the "
                        "worker-fault region (BENCH_NOTES round 5) — "
                        "sharding does not change that; use a "
                        "fused-capable model or serve unsharded (the "
                        "contained chunked dispatch)")
                run = (make_sharded_warm_solver(model, cfg, mesh)
                       if warm else make_sharded_solver(model, cfg, mesh))
            # warm dispatch order is (x0, us, xs, K, lam, dlam) — exactly
            # the sharded warm solver's positional order after (params, dt)
            inner = lambda *arrs: run(params, dt, *arrs)  # noqa: E731
        else:
            fn, dmeta = build_dispatch(
                model, params, cfg, dt, self._T, self._max_batch,
                path=path, warm=warm, fields=fields)
            if dmeta["packed"]:
                inner = jax.jit(fn)
                self._pack = functools.partial(
                    unpack_dispatch_output, dmeta=dmeta)
                self._pack_inputs = True
            elif dmeta.get("eager") or (path == "fused"
                                        and self._max_batch > 1024):
                inner = fn  # eager host chunk loop — must NOT be jitted
                self._pad_multiple = dmeta.get("pad_multiple")
            else:
                inner = jax.jit(fn)

        def _solve(*inputs):
            # Pad EVERY dispatch to max_batch — IN NUMPY — so exactly one
            # program shape ever reaches the device: one fixed-shape H2D
            # transfer per input, one block solve, one packed D2H. Doing
            # the pad/unpad with device ops is NOT equivalent: eager
            # jnp.concatenate / broadcast_to at pad time and per-leaf
            # ``a[:b]`` slices at unpad time each compile a distinct
            # remote program per distinct lane count b, and the axon
            # backend takes seconds per tiny program (BENCH_NOTES round
            # 4: variable-B glue ran at ~3.4 s/batch with p99 15-97 s).
            # ``inputs`` are numpy, each with leading batch axis b:
            # (x0, u0) cold, (x0, us, xs, K, lam, dlam) warm.
            # The eager wide-m route instead pads to pad_multiple-lane
            # multiples (its sub-batch program is shape-stable and its
            # per-process work ledger is scarce — build_dispatch).
            b = inputs[0].shape[0]
            if self._pad_multiple:
                pm = self._pad_multiple
                n_pad = min(self._max_batch, -(-b // pm) * pm)
            else:
                n_pad = self._max_batch
            padded = []
            for a in inputs:
                p = np.empty((n_pad,) + a.shape[1:], np.float32)
                p[:b] = a
                p[b:] = a[0]
                padded.append(p)
            if mesh is not None:
                # hand numpy straight to the sharded runner: its
                # device_put shards host->devices directly; jnp.asarray
                # here would first commit the full batch to device 0 and
                # pay an extra transfer + reshard per dispatch
                out = inner(*padded)
            elif self._pack_inputs:
                # ONE flat H2D transfer; device-side split/reshape.
                flat_in = np.concatenate([p.ravel() for p in padded])
                out = inner(jnp.asarray(flat_in))
            else:
                out = inner(*[jnp.asarray(p) for p in padded])
            if self._pack is not None:
                # ONE flat D2H transfer, then host-side view/reshape.
                sol = self._pack(np.asarray(out))
            else:
                # Full-shape D2H per leaf (numpy), then slice on host.
                sol = jax.tree_util.tree_map(np.asarray, out)
                if fields is not None:
                    # host-side filter (no bandwidth win on this path,
                    # but the same per-request Solution shape)
                    sol = Solution(*[
                        (getattr(sol, f) if f in fields else None)
                        for f in Solution._fields])
            return jax.tree_util.tree_map(lambda a: a[:b], sol)

        def _solve_resident(x0b, slots, wmask):
            # H2D payload: x0 + slot ids + warm flags — ~20 B/lane (the
            # warm pytree stays resident on device). slots int32 travel
            # bit-cast inside the flat f32 array.
            b = x0b.shape[0]
            n_pad = self._max_batch
            x0p = np.empty((n_pad, model.n), np.float32)
            x0p[:b] = x0b
            x0p[b:] = x0b[0]
            sl = np.full((n_pad,), self.resident, np.int32)  # pad→scratch
            sl[:b] = slots
            wm = np.zeros((n_pad,), np.float32)
            wm[:b] = wmask
            flat = np.concatenate([x0p.ravel(), sl.view(np.float32), wm])
            if self._res_state is None:
                self._res_state = self._res_init()
            try:
                out = inner(*self._res_state, jnp.asarray(flat))
                # SYNC before committing the new state: device faults
                # often surface lazily at the D2H (CLAUDE.md), so the
                # np.asarray must sit inside this guard or a failed
                # dispatch would leave donation-consumed/poisoned
                # buffers installed as the fleet state
                flat_out = np.asarray(out[5])
                self._res_state = out[:5]
            except Exception:
                # the state buffers were donated into a failed dispatch —
                # reset the fleet to cold rather than serve from garbage
                self._res_state = None
                self._slot_used[:] = False
                raise
            sol = unpack_dispatch_output(flat_out, self._res_dmeta)
            return jax.tree_util.tree_map(lambda a: a[:b], sol)

        def _solve_resident_mesh(x0p, lslots, wmask):
            # lanes already bucketed per device by _process; inputs are
            # full (max_batch,) arrays with scratch-slot padding
            if self._res_state is None:
                self._res_state = self._res_init()
            try:
                new_state, sol = self._res_run(
                    self._res_state, x0p, lslots, wmask)
                # sync BEFORE committing (lazy device faults — see
                # _solve_resident)
                sol = jax.tree_util.tree_map(np.asarray, sol)
                self._res_state = new_state
            except Exception:
                self._res_state = None
                self._slot_used[:] = False
                raise
            return sol

        self._solve_resident_mesh = _solve_resident_mesh
        self._solve_resident = _solve_resident
        self._solve = _solve
        self._queue: "queue.Queue" = queue.Queue()
        self._lock = threading.Lock()
        self._closed = False
        self.stats = {"requests": 0, "batches": 0, "lanes": 0,
                      "solve_s": 0.0}
        self._worker: Optional[threading.Thread] = None
        if autostart:
            self._worker = threading.Thread(
                target=self._run_loop, name="ilqr-serve", daemon=True)
            self._worker.start()

    # ---- client API ------------------------------------------------------

    def submit(self, x0, u0=None, prev=None, slot=None) -> Future:
        """Enqueue one problem; returns a Future of a per-request Solution
        (batch axis already stripped: ``sol.cost`` is a scalar, ``sol.us``
        is (T, m), ...).

        On a ``warm=True`` service, ``prev`` may be the Solution this
        service previously returned for the same controller — the lane
        then warm-starts MPC-style (re-rollout prev.us with prev.K, λ/dλ
        carried; ref ilqr_core.cpp:65-76). ``prev=None`` lanes solve
        cold (a synthesized K=0, λ=λ_init warm payload — verified
        bit-identical to the cold path).

        On a ``resident_slots=C`` service, pass ``slot`` (0 ≤ slot < C,
        one per controller) instead of ``prev``: the controller's warm
        state lives on device, the first request per slot solves cold
        (from zero controls) and every later one warm-starts from the
        slot's resident state. At most one request per slot may be in
        flight (a second one coalesced into the same batch is deferred
        to the next dispatch)."""
        x0 = np.asarray(x0, np.float32)
        if x0.shape != (self._model.n,):
            raise ValueError(f"x0 must be ({self._model.n},), got {x0.shape}")
        if self.resident:
            if slot is None:
                raise ValueError(
                    "this is a resident_slots service — pass slot= "
                    "(the controller's device-state slot id)")
            if prev is not None:
                raise ValueError(
                    "resident services track warm state on device; "
                    "prev= does not apply (use slot=)")
            if u0 is not None:
                raise ValueError(
                    "resident services solve cold lanes from zero "
                    "controls (u0= does not apply)")
            slot = int(slot)
            if not 0 <= slot < self.resident:
                raise ValueError(
                    f"slot must be in [0, {self.resident}), got {slot}")
            req = _Request(x0, None, slot=slot)
            with self._lock:
                if self._closed:
                    raise RuntimeError("SolverService is closed")
                self.stats["requests"] += 1
                self._queue.put(req)
            return req.future
        if slot is not None:
            raise ValueError("slot= requires a resident_slots service")
        if u0 is None:
            u0 = np.zeros((self._T, self._model.m), np.float32)
        else:
            u0 = np.asarray(u0, np.float32)
            if u0.shape != (self._T, self._model.m):
                raise ValueError(
                    f"u0 must be ({self._T}, {self._model.m}), got {u0.shape}")
        warm_payload = None
        if prev is not None:
            if not self.warm:
                raise ValueError(
                    "prev= requires a warm=True service (one compiled "
                    "program per service; this one is cold)")
            T, m, n = self._T, self._model.m, self._model.n
            need = {"us": (T, m), "xs": (T + 1, n), "K": (T, m, n),
                    "lam": (), "dlam": ()}
            leaves = []
            for name in ("us", "xs", "K", "lam", "dlam"):
                leaf = getattr(prev, name)
                if leaf is None:
                    raise ValueError(
                        f"prev.{name} is None — warm starts need us/xs/K/"
                        "lam/dlam (don't filter them out with fields=)")
                leaf = np.asarray(leaf, np.float32)
                if leaf.shape != need[name]:
                    raise ValueError(
                        f"prev.{name} must have shape {need[name]}, got "
                        f"{leaf.shape}")
                leaves.append(leaf)
            warm_payload = tuple(leaves)
        req = _Request(x0, u0, prev=warm_payload)
        # Enqueue under the same lock as the _closed check: close() commits
        # shutdown (flips _closed + enqueues the sentinel) under this lock,
        # so no request can slip into the queue after the worker's drain —
        # a request enqueued post-shutdown would never resolve.
        with self._lock:
            if self._closed:
                raise RuntimeError("SolverService is closed")
            self.stats["requests"] += 1
            self._queue.put(req)
        return req.future

    def solve(self, x0, u0=None, prev=None, slot=None,
              timeout: Optional[float] = None) -> Solution:
        """Synchronous convenience: ``submit(...).result(timeout)``."""
        return self.submit(x0, u0, prev=prev, slot=slot).result(timeout)

    def close(self, timeout: Optional[float] = None) -> bool:
        """Stop accepting requests, drain the queue, join the worker.

        With ``timeout=None`` (default) this blocks until the worker has
        finished every in-flight batch — note a first TPU dispatch can sit
        in a 10-600 s remote compile, so bounded shutdowns should pass a
        ``timeout``. Returns True if the worker fully exited, False if the
        timeout expired with the worker still running (its futures will
        still resolve when the in-flight solve completes)."""
        with self._lock:
            if self._closed:
                worker = self._worker
                return worker is None or not worker.is_alive()
            self._closed = True
            # Sentinel enqueued under the lock: pairs with submit()'s
            # locked check+put so the queue is never appended to after it.
            self._queue.put(_SHUTDOWN)
        if self._worker is not None:
            self._worker.join(timeout)
            return not self._worker.is_alive()
        return True

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    # ---- worker ----------------------------------------------------------

    def _collect(self, block: bool = True):
        """Pull one coalesced batch (or the shutdown sentinel) off the queue.

        Blocks for the first request, then keeps taking whatever arrives
        within ``max_wait_ms`` up to ``max_batch`` lanes.
        """
        try:
            first = self._queue.get(block=block)
        except queue.Empty:
            return None
        if first is _SHUTDOWN:
            return _SHUTDOWN
        batch = [first]
        deadline = time.monotonic() + self._max_wait_s
        while len(batch) < self._max_batch:
            remaining = deadline - time.monotonic()
            try:
                nxt = self._queue.get(
                    block=remaining > 0, timeout=max(remaining, 0) or None)
            except queue.Empty:
                break
            if nxt is _SHUTDOWN:
                # put it back so the loop exits after this batch
                self._queue.put(_SHUTDOWN)
                break
            batch.append(nxt)
        return batch

    def _process(self, batch) -> None:
        # Claim each future before solving: set_running_or_notify_cancel()
        # returns False for futures the client already cancelled (e.g. after
        # a result(timeout) expiry followed by cancel()) — drop those lanes.
        # Once claimed, a future can no longer be cancelled, so delivery
        # below cannot raise InvalidStateError and kill the worker thread.
        if self.resident:
            # at most one in-flight request per slot: a duplicate slot in
            # one batch would race the device-side scatter — defer
            # duplicates to the next dispatch (their futures stay pending)
            seen, keep = set(), []
            for r in batch:
                if r.slot in seen:
                    self._queue.put(r)
                else:
                    seen.add(r.slot)
                    keep.append(r)
            batch = keep
            if self._res_mesh is not None:
                # slot s lives on device s % D: bucket lanes per device
                # (each device's sub-batch holds max_batch/D lanes);
                # bucket overflow defers like duplicates do
                D = self._res_mesh.size
                mbs = self._max_batch // D
                buckets = [[] for _ in range(D)]
                for r in batch:
                    d = r.slot % D
                    if len(buckets[d]) < mbs:
                        buckets[d].append(r)
                    else:
                        self._queue.put(r)
                batch = [r for b in buckets for r in b]
        lanes = None
        batch = [r for r in batch if r.future.set_running_or_notify_cancel()]
        if not batch:
            return
        t0 = time.monotonic()
        try:
            # numpy in, numpy out — _solve owns the (single, fixed-shape)
            # H2D/D2H pair; everything here stays on host.
            x0b = np.stack([r.x0 for r in batch])
            if self.resident and self._res_mesh is not None:
                D = self._res_mesh.size
                mbs = self._max_batch // D
                c_loc = self._res_dmeta["slots_per_device"]
                x0p = np.zeros((self._max_batch, self._model.n),
                               np.float32)
                lsl = np.full((self._max_batch,), c_loc, np.int32)
                wm = np.zeros((self._max_batch,), np.float32)
                counts = [0] * D
                lanes = []
                for r in batch:
                    d = r.slot % D
                    lane = d * mbs + counts[d]
                    counts[d] += 1
                    x0p[lane] = r.x0
                    lsl[lane] = r.slot // D
                    wm[lane] = float(self._slot_used[r.slot])
                    lanes.append(lane)
                sol = self._solve_resident_mesh(x0p, lsl, wm)
                self._slot_used[[r.slot for r in batch]] = True
            elif self.resident:
                slots = np.asarray([r.slot for r in batch], np.int32)
                wmask = self._slot_used[slots].astype(np.float32)
                sol = self._solve_resident(x0b, slots, wmask)
                self._slot_used[slots] = True
            elif self.warm:
                # synthesize the cold-equivalent payload for prev=None
                # lanes: us=u0, K=0 (feedback term vanishes -> open-loop
                # rollout), xs irrelevant, lam/dlam at their cold inits —
                # verified bit-identical to the cold solve.
                T, m, n = self._T, self._model.m, self._model.n
                cfg_ = self._cfg

                def payload(r):
                    if r.prev is not None:
                        return r.prev
                    return (r.u0, np.zeros((T + 1, n), np.float32),
                            np.zeros((T, m, n), np.float32),
                            np.float32(cfg_.lambda_init),
                            np.float32(cfg_.dlambda_init))

                cols = list(zip(*[payload(r) for r in batch]))
                sol = self._solve(x0b, *[np.stack(c) for c in cols])
            else:
                sol = self._solve(x0b, np.stack([r.u0 for r in batch]))
        except Exception as e:  # noqa: BLE001 — propagate to ALL callers
            for r in batch:
                r.future.set_exception(e)
            return
        dt = time.monotonic() - t0
        with self._lock:
            self.stats["batches"] += 1
            self.stats["lanes"] += len(batch)
            self.stats["solve_s"] += dt
        for i, r in enumerate(batch):
            j = lanes[i] if lanes is not None else i
            r.future.set_result(jax.tree_util.tree_map(
                lambda a, j=j: np.array(a[j]), sol))
            # np.array COPIES each per-lane slice (preserving 0-d
            # scalars): without it the packed path's views would pin the
            # whole batch's flat D2H buffer (~tens of MB) for as long as
            # ANY caller keeps its (small) Solution alive.

    def _run_once(self, block: bool = True) -> bool:
        """One worker step; returns False on shutdown/empty. Test hook."""
        batch = self._collect(block=block)
        if batch is None or batch is _SHUTDOWN:
            return False
        try:
            self._process(batch)
        except BaseException as e:  # noqa: BLE001 — _process handles solver
            # errors itself; anything escaping it is a worker-level bug.
            # Fail the in-flight batch so no caller hangs, then re-raise.
            for r in batch:
                try:
                    if not r.future.done():
                        r.future.set_exception(e)
                except Exception:  # noqa: BLE001 — racing cancellation
                    pass
            raise
        return True

    def _run_loop(self) -> None:
        try:
            while self._run_once(block=True):
                pass
            # drain any stragglers enqueued before close() flipped _closed
            while self._run_once(block=False):
                pass
        except BaseException as e:  # noqa: BLE001 — the worker must never
            # die silently: fail every queued future so no caller hangs,
            # then re-raise (visible via threading.excepthook).
            # Close the service FIRST: without this, a submit() racing the
            # drain below (or arriving any time after it) would enqueue a
            # request no worker will ever process and its future would
            # hang forever; closed-service submits raise instead.
            with self._lock:
                self._closed = True
            while True:
                try:
                    item = self._queue.get(block=False)
                except queue.Empty:
                    break
                if item is _SHUTDOWN:
                    continue
                if item.future.set_running_or_notify_cancel():
                    item.future.set_exception(e)
            raise
