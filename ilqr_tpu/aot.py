"""Ahead-of-time compiled batch solves: save/load serialized executables.

Why this exists: on the TPU backend a fresh process pays host tracing +
lowering + (remote) compile for the fused program before the first solve
— measured at lower 293.9 s + compile 6.3 s for the B=1024 acrobot
serving shape (BENCH_NOTES round 4, experiments/aot_probe.py), and
the persistent *compilation* cache cannot recover the lowering part.
``jax.experimental.serialize_executable`` can: AOT-compile once,
serialize the PJRT executable (~50 MB for that program), and later
processes ``load()`` + run with no tracing and no compile at all.

The reference has no analogue — its C++ binary is itself the "compiled
artifact" (a ~1 s build, src/run_ilqr.cpp); this module gives the TPU
deployment the same cold-start economics.

Contract: an AOT executable is pinned to exact input shapes, dtypes,
backend, and jax version. ``AotSolver`` records that metadata alongside
the payload and refuses a mismatched load with a clear error instead of
letting PJRT fail obscurely (or SIGILL, for CPU blobs compiled on a
different host).

Backend support: TPU is the deployment target and is verified
cross-process on hardware (BENCH_NOTES round 4: load 1.5 s, first exec
1.9 s, bit-identical results). The CPU backend can save/load within ONE
process (covered by tests/test_aot.py), but executing a CPU blob in a
*different* process SIGILLs in this jax build — XLA:CPU's AOT loader
itself warns that its recorded machine features don't match the host
("Compile machine features ... vs host machine features ...",
cpu_aot_loader.cc). Treat CPU AOT as test-only.

Persistent-compilation-cache interaction: ``compile_solver`` bypasses
the cache for its own compile (an executable rehydrated from the cache
does not survive serialize()), and on XLA:CPU a process that EXECUTES a
deserialized executable while also rehydrating its eager programs from
a persistent cache dies with "NOT_FOUND: Buffer Definition Event:
Function wrapped_broadcast.N not found" — unset
JAX_COMPILATION_CACHE_DIR in CPU serving processes that load blobs
(tests/test_examples.py does). The TPU backend has no such issue
(chain-G/I/J runs all loaded + executed blobs with normal env).
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ilqr_tpu.config import SolverConfig
from ilqr_tpu.models.base import Model
from ilqr_tpu.types import Solution

_MAGIC = "ilqr_tpu-aot-v1"



def pack_specs(out_shapes):
    """(shape, dtype-str) per leaf of an eval_shape'd output tree when
    every leaf is 32-bit (packable), else None."""
    leaves = jax.tree_util.tree_leaves(out_shapes)
    if not all(l.dtype.itemsize == 4 for l in leaves):
        return None
    return [(tuple(int(d) for d in l.shape), str(l.dtype)) for l in leaves]


def pack_leaves(tree):
    """Device-side: ravel every leaf (i32 bitcast through f32,
    width-preserving) and concatenate into ONE flat f32 array — one D2H
    transfer instead of one per leaf (~26 ms each on the TPU tunnel,
    BENCH_NOTES round 4)."""
    return jnp.concatenate([
        (jax.lax.bitcast_convert_type(l, jnp.float32)
         if l.dtype != jnp.float32 else l).ravel()
        for l in jax.tree_util.tree_leaves(tree)])


def unpack_flat(flat_np, specs):
    """Host-side inverse of :func:`pack_leaves`: split the fetched flat
    array by the recorded specs and view/reshape each leaf back. The
    returned arrays are VIEWS into one buffer — callers handing slices
    to long-lived consumers should copy them (serve.py does)."""
    sizes = [int(np.prod(sh)) for sh, _ in specs]
    parts = np.split(np.asarray(flat_np), np.cumsum(sizes)[:-1])
    return [
        (p.view(np.dtype(dt_)) if np.dtype(dt_) != np.float32
         else p).reshape(sh)
        for p, (sh, dt_) in zip(parts, specs)]


@dataclass
class AotSolver:
    """A shape-pinned, pre-compiled batch solve.

    Call it like ``solve_batch``: ``sol = aot(x0, u0)`` with x0 of
    exactly ``(B, n)`` and u0 of exactly ``(B, T, m)`` float32. Build
    with :func:`compile_solver`, persist with :meth:`save`, restore in a
    fresh process with :func:`load`.
    """

    compiled: Any  # jax.stages.Compiled (or deserialized executable)
    meta: dict

    def __call__(self, *arrays) -> Solution:
        """Run the pre-compiled solve.

        Cold programs take ``(x0, u0)``; warm programs (compiled with
        ``warm=True``) take ``(x0, us, xs, K, lam, dlam)``. Shapes are
        validated against the recorded pins. Packed (TPU) programs do
        their single-transfer pack/unpack here — inputs may be numpy;
        the returned Solution holds numpy arrays (views — copy what you
        keep). Unpacked programs return device arrays.
        """
        dmeta = self.meta.get("dispatch")
        if dmeta is None:
            # legacy blob layout (pre-build_dispatch): (x0, u0) only
            x0, u0 = (jnp.asarray(a) for a in arrays)
            exp_x = tuple(self.meta["x0_shape"])
            exp_u = tuple(self.meta["u0_shape"])
            if tuple(x0.shape) != exp_x or tuple(u0.shape) != exp_u:
                raise ValueError(
                    f"AOT executable is shape-pinned: expected x0 {exp_x} "
                    f"/ u0 {exp_u}, got {tuple(x0.shape)} / "
                    f"{tuple(u0.shape)}. Re-run compile_solver.")
            if x0.dtype != jnp.float32 or u0.dtype != jnp.float32:
                raise ValueError("AOT solves are float32 (pass f32 inputs)")
            out = self.compiled(x0, u0)
            specs = self.meta.get("packed_leaves")
            if specs is None:
                return out
            return Solution(*unpack_flat(out, specs))

        if dmeta.get("resident"):
            raise ValueError(
                "this is a resident-fleet executable — its state buffers "
                "are owned by the service; construct "
                "SolverService(resident_slots=..., aot=...) instead of "
                "calling it directly")
        in_specs = dmeta["in_specs"]
        if len(arrays) != len(in_specs):
            kind = "warm (x0, us, xs, K, lam, dlam)" if dmeta["warm"] \
                else "cold (x0, u0)"
            raise ValueError(
                f"this AOT program is {kind}: expected {len(in_specs)} "
                f"arrays, got {len(arrays)}")
        arrays = [np.asarray(a) for a in arrays]
        if any(a.dtype != np.float32 for a in arrays):
            raise ValueError("AOT solves are float32 (pass f32 inputs)")
        for a, (sh, _) in zip(arrays, in_specs):
            if a.shape != tuple(sh):
                raise ValueError(
                    f"AOT executable is shape-pinned: expected "
                    f"{[tuple(sh) for sh, _ in in_specs]}, got "
                    f"{[x.shape for x in arrays]}")
        if not dmeta["packed"]:
            if self.meta.get("mesh") is not None:
                # sharded program: place each input with the recorded
                # batch sharding (host→devices direct, no device-0 stop)
                from jax.sharding import NamedSharding, PartitionSpec

                mesh = getattr(self, "_mesh", None)
                if mesh is None:
                    mesh = self._mesh = _mesh_from_meta(self.meta)
                spec = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
                return self.compiled(
                    *[jax.device_put(a, spec) for a in arrays])
            return self.compiled(*[jnp.asarray(a) for a in arrays])
        flat = np.concatenate([a.ravel() for a in arrays])
        out = self.compiled(jnp.asarray(flat))
        from ilqr_tpu.serve import unpack_dispatch_output

        return unpack_dispatch_output(np.asarray(out), dmeta)

    # ---- persistence -----------------------------------------------------

    def save(self, path: str) -> None:
        """Serialize the executable + metadata to ``path``."""
        from jax.experimental.serialize_executable import serialize

        payload, in_tree, out_tree = serialize(self.compiled)
        blob = {"magic": _MAGIC, "meta": self.meta, "payload": payload,
                "in_tree": in_tree, "out_tree": out_tree}
        with open(path, "wb") as f:
            f.write(pickle.dumps(blob))


def _env_meta() -> dict:
    return {"backend": jax.default_backend(),
            "jax_version": jax.__version__,
            "device_kind": jax.devices()[0].device_kind}


def problem_digest(params, cfg: SolverConfig) -> str:
    """Digest of everything the executable BAKES IN beyond shapes: the
    params pytree (goal, weights, control limits, ...) and the full
    SolverConfig. Shape checks alone would let a blob compiled for a
    different goal/limit/λ-schedule silently serve wrong solutions;
    ``SolverService(aot=...)`` compares this digest against the service's
    own (params, cfg) and refuses a mismatch. Float leaves are hashed as
    float32 (the solve dtype), so passing the same values as f64 numpy
    vs f32 jnp digests identically."""
    import hashlib

    h = hashlib.sha256()
    h.update(repr(cfg).encode())
    leaves, treedef = jax.tree_util.tree_flatten(params)
    h.update(str(treedef).encode())
    for leaf in leaves:
        a = np.asarray(leaf)
        if a.dtype.kind == "f":
            a = a.astype(np.float32)
        h.update(str(a.shape).encode())
        h.update(str(a.dtype).encode())
        h.update(np.ascontiguousarray(a).tobytes())
    return h.hexdigest()


def _compile_uncached(jitted, args):
    """lower+compile with the persistent compilation cache bypassed: an
    executable REHYDRATED from the cache loses runtime metadata that
    serialize()/deserialize_and_load needs (observed on XLA:CPU as
    "NOT_FOUND: Buffer Definition Event: Function wrapped_broadcast.N
    not found" at the first D2H). AOT is a pay-the-tax-once operation
    and we persist the executable ourselves, so the cache adds nothing
    here anyway."""
    cache_was = jax.config.jax_enable_compilation_cache
    jax.config.update("jax_enable_compilation_cache", False)
    try:
        return jitted.lower(*args).compile()
    finally:
        jax.config.update("jax_enable_compilation_cache", cache_was)


def _mesh_from_meta(meta):
    """Reconstruct the compile-time mesh on this process's devices."""
    from jax.sharding import Mesh

    mm = meta["mesh"]
    devices = jax.devices()[:int(mm["size"])]
    if len(devices) < int(mm["size"]):
        raise RuntimeError(
            f"AOT executable needs {mm['size']} devices "
            f"({mm['shape']} mesh), this process has {len(devices)}")
    return Mesh(np.array(devices).reshape(tuple(mm["shape"])),
                tuple(mm["axes"]))


def compile_solver(model: Model, params, cfg: SolverConfig, dt: float,
                   batch: int, horizon: int, *, path: str = "auto",
                   warm: bool = False, fields=None, mesh=None,
                   resident_slots: int = 0) -> AotSolver:
    """AOT-compile a batch solve at a fixed ``(batch, horizon)`` shape.

    Compiles the same dispatch program ``SolverService`` builds
    (serve.build_dispatch), so a blob can drop straight into
    ``SolverService(aot=...)`` — including ``warm=True`` (MPC warm-start
    program; inputs (x0, us, xs, K, lam, dlam)) and ``fields=``
    (selected Solution leaves only). On TPU the program takes ONE flat
    f32 input array and returns ONE flat f32 output array (single H2D +
    D2H transfer per dispatch); ``AotSolver.__call__`` does the
    pack/unpack, so callers still pass/receive ordinary arrays.

    path: 'fused' (kernel-layout solver; batch <= the 1024-lane block),
      'vmap' (``jax.vmap(solve)``), or 'auto' (fused on TPU when
      ``fused.fused_applicable`` accepts the model/config, else vmap).

    mesh: a ``jax.sharding.Mesh`` — the compiled program is then the
      SHARDED dispatch (``parallel.mesh`` solvers under ``shard_map``)
      with ``batch`` split over the mesh devices, and the blob records
      the mesh topology; ``load()`` rebinds it to the first
      ``mesh.size`` devices of the loading process. Sharded programs
      skip the single-transfer packing (the gather happens at fetch) —
      inputs/outputs are ordinary per-leaf arrays. Drop the blob into
      ``SolverService(mesh=..., aot=...)`` with an equal mesh.
    """
    if path not in ("auto", "fused", "vmap"):
        raise ValueError(f"unknown path {path!r}")
    if resident_slots:
        return _compile_resident(model, params, cfg, dt, batch, horizon,
                                 int(resident_slots), path=path,
                                 fields=fields, mesh=mesh)
    if mesh is not None:
        return _compile_sharded(model, params, cfg, dt, batch, horizon,
                                path=path, warm=warm, fields=fields,
                                mesh=mesh)
    if path == "auto":
        from ilqr_tpu.fused import fused_applicable

        path = ("fused" if jax.default_backend() == "tpu"
                and fused_applicable(model, cfg) and batch <= 1024
                else "vmap")
    if path == "fused" and batch > 1024:
        raise ValueError(
            "AOT fused solves compile ONE block program; use "
            "batch <= 1024 and loop blocks on the host")

    from ilqr_tpu.serve import build_dispatch

    # Pack only on TPU: XLA:CPU's AOT deserializer cannot load the
    # packed program under a multi-device host ("Buffer Definition
    # Event: Function wrapped_broadcast not found" — a CPU-AOT defect
    # alongside the cross-process SIGILL documented above).
    fn, dmeta = build_dispatch(
        model, params, cfg, dt, horizon, batch, path=path, warm=warm,
        fields=fields, pack=(jax.default_backend() == "tpu"))

    if dmeta.get("eager"):
        raise ValueError(
            f"m={model.m} > MAX_STAGE_KERNEL_M vmap dispatch on TPU runs "
            "as a host-driven iteration-chunked loop (the monolithic "
            "program can crash the TPU worker — BENCH_NOTES round 5) and "
            "cannot be AOT-compiled as one executable; use "
            "SolverService without aot= for this model")
    if dmeta["packed"]:
        args = (jnp.zeros((dmeta["flat_in_size"],), jnp.float32),)
    else:
        args = tuple(jnp.zeros(sh, jnp.float32)
                     for sh, _ in dmeta["in_specs"])

    compiled = _compile_uncached(jax.jit(fn), args)
    x0_shape = (batch, model.n)
    u0_shape = (batch, horizon, model.m)
    meta = {"model": getattr(model, "name", repr(model)), "path": path,
            "x0_shape": x0_shape, "u0_shape": u0_shape,
            "dispatch": dmeta,
            "dt": float(dt), "max_iter": int(cfg.max_iter),
            # everything else the executable bakes in (params values,
            # full SolverConfig) — validated by SolverService(aot=...)
            "problem_digest": problem_digest(params, cfg),
            # the unsharded jit compiles a 1-device program; load() must
            # bind the executable to exactly this many devices (the
            # deserializer otherwise spans ALL local devices and then
            # demands per-device input shards — found by tests/test_aot
            # under the 8-virtual-device CPU mesh)
            "num_devices": 1,
            **_env_meta()}
    return AotSolver(compiled, meta)


def _compile_sharded(model: Model, params, cfg: SolverConfig, dt: float,
                     batch: int, horizon: int, *, path: str, warm: bool,
                     fields, mesh) -> AotSolver:
    """AOT-compile the SHARDED dispatch (VERDICT r4 item 2): the
    shard_map'ed solvers from ``parallel.mesh`` with params/dt baked in,
    lowered with batch-sharded input shardings, compiled, and ready for
    ``serialize()``. Verified: a shard_map/pjit executable survives
    serialize → deserialize_and_load (CPU 8-device mesh in-process, and
    the 1-device TPU mesh cross-process — experiments/mesh_aot_tpu.py),
    so multi-device services get the same cold-start economics as
    single-device ones. No single-transfer packing under a mesh (a
    packed flat output would force a device-0 gather; the per-leaf
    fetch already gathers at D2H)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ilqr_tpu.parallel.mesh import (
        BATCH_AXIS,
        make_sharded_fused_solver,
        make_sharded_fused_warm_solver,
        make_sharded_solver,
        make_sharded_warm_solver,
    )

    T, n, m = int(horizon), model.n, model.m
    if batch % mesh.size:
        raise ValueError(
            f"batch={batch} must be divisible by the mesh size "
            f"{mesh.size}")
    shard = batch // mesh.size
    if path == "auto":
        from ilqr_tpu.fused import fused_applicable

        path = ("fused" if jax.default_backend() == "tpu"
                and fused_applicable(model, cfg) and shard <= 1024
                else "vmap")
    if path == "fused" and shard > 1024:
        raise ValueError(
            f"per-device shard {shard} exceeds the 1024-lane fused "
            "block; raise the mesh size or lower batch")
    if path == "fused":
        run = (make_sharded_fused_warm_solver if warm
               else make_sharded_fused_solver)(model, cfg, mesh)
    else:
        run = (make_sharded_warm_solver if warm
               else make_sharded_solver)(model, cfg, mesh)

    if warm:
        in_shapes = [(batch, n), (batch, T, m), (batch, T + 1, n),
                     (batch, T, m, n), (batch,), (batch,)]
    else:
        in_shapes = [(batch, n), (batch, T, m)]

    def select(sol):
        if fields is None:
            return sol
        return Solution(*[
            (getattr(sol, f) if f in fields else None)
            for f in Solution._fields])

    def raw(*arrays):
        # params/dt baked as constants; run.jitted is the shard_map'ed
        # program (inner jit inlines under this outer jit)
        return select(run.jitted(params, jnp.asarray(dt), *arrays))

    bspec = NamedSharding(mesh, P(BATCH_AXIS))
    in_s = tuple(jax.ShapeDtypeStruct(sh, jnp.float32)
                 for sh in in_shapes)
    compiled = _compile_uncached(
        jax.jit(raw, in_shardings=(bspec,) * len(in_s)), in_s)
    dmeta = {"packed": False, "warm": bool(warm),
             "fields": None if fields is None else tuple(fields),
             "in_specs": [(sh, "float32") for sh in in_shapes]}
    meta = {"model": getattr(model, "name", repr(model)), "path": path,
            "x0_shape": (batch, n), "u0_shape": (batch, T, m),
            "dispatch": dmeta,
            "dt": float(dt), "max_iter": int(cfg.max_iter),
            "problem_digest": problem_digest(params, cfg),
            "mesh": {"shape": [int(d) for d in mesh.devices.shape],
                     "axes": list(mesh.axis_names),
                     "size": int(mesh.size)},
            "num_devices": int(mesh.size),
            **_env_meta()}
    return AotSolver(compiled, meta)


def _compile_resident(model: Model, params, cfg: SolverConfig, dt: float,
                      batch: int, horizon: int, capacity: int, *,
                      path: str, fields, mesh=None) -> AotSolver:
    """AOT-compile the DEVICE-RESIDENT fleet dispatch
    (serve.build_resident_dispatch / build_resident_mesh_dispatch):
    donated state buffers + the tiny (x0, slot, warm-flag) input. The
    blob drops into ``SolverService(resident_slots=capacity, [mesh=,]
    aot=...)`` — the service owns the state lifecycle; calling the
    AotSolver directly raises."""
    if path == "auto":
        from ilqr_tpu.fused import fused_applicable

        shard = batch // mesh.size if mesh is not None else batch
        path = ("fused" if jax.default_backend() == "tpu"
                and fused_applicable(model, cfg) and shard <= 1024
                else "vmap")
    f32 = jnp.float32
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ilqr_tpu.parallel.mesh import BATCH_AXIS
        from ilqr_tpu.serve import build_resident_mesh_dispatch

        run, dmeta, _init = build_resident_mesh_dispatch(
            model, params, cfg, dt, horizon, batch, capacity, mesh,
            path=path, fields=fields)
        bspec = NamedSharding(mesh, P(BATCH_AXIS))

        # bake params/dt (the shard_map program takes them as args)
        def wrapped(*sa):
            return run.fn(params, jnp.asarray(dt), *sa)

        state_sds = [jax.ShapeDtypeStruct(tuple(sh), f32)
                     for sh, _ in dmeta["state_shapes"]]
        in_s = tuple(state_sds) + (
            jax.ShapeDtypeStruct((batch, model.n), f32),
            jax.ShapeDtypeStruct((batch,), jnp.int32),
            jax.ShapeDtypeStruct((batch,), f32))
        compiled = _compile_uncached(
            jax.jit(wrapped, donate_argnums=(0, 1, 2, 3, 4),
                    in_shardings=(bspec,) * len(in_s)), in_s)
        mesh_meta = {"shape": [int(d) for d in mesh.devices.shape],
                     "axes": list(mesh.axis_names),
                     "size": int(mesh.size)}
        ndev = int(mesh.size)
    else:
        from ilqr_tpu.serve import build_resident_dispatch

        fn, dmeta, _init = build_resident_dispatch(
            model, params, cfg, dt, horizon, batch, capacity,
            path=path, fields=fields)
        in_s = [jax.ShapeDtypeStruct(tuple(sh), f32)
                for sh, _ in dmeta["state_shapes"]]
        in_s.append(jax.ShapeDtypeStruct((dmeta["flat_in_size"],), f32))
        compiled = _compile_uncached(
            jax.jit(fn, donate_argnums=(0, 1, 2, 3, 4)), in_s)
        mesh_meta = None
        ndev = 1
    meta = {"model": getattr(model, "name", repr(model)), "path": path,
            "x0_shape": (batch, model.n),
            "u0_shape": (batch, int(horizon), model.m),
            "dispatch": dmeta,
            "dt": float(dt), "max_iter": int(cfg.max_iter),
            "problem_digest": problem_digest(params, cfg),
            "num_devices": ndev,
            **_env_meta()}
    if mesh_meta is not None:
        meta["mesh"] = mesh_meta
    return AotSolver(compiled, meta)


def load(path: str) -> AotSolver:
    """Restore an :class:`AotSolver` saved by :meth:`AotSolver.save`.

    Validates backend / device kind / jax version before handing the
    payload to PJRT, so a blob compiled for another target fails with an
    actionable message.

    SECURITY: the blob is a pickle (that is what
    ``jax.experimental.serialize_executable`` itself uses for the
    in/out trees), and unpickling untrusted data is arbitrary code
    execution — no magic/metadata check can run before the
    ``pickle.loads`` below. Only load blobs you produced and stored
    somewhere you trust, exactly as you would treat a shared object /
    executable file (the reference's deployment artifact is literally a
    C++ binary, src/run_ilqr.cpp — same trust model).
    """
    from jax.experimental.serialize_executable import deserialize_and_load

    with open(path, "rb") as f:
        blob = pickle.loads(f.read())
    if not isinstance(blob, dict) or blob.get("magic") != _MAGIC:
        raise ValueError(f"{path} is not an ilqr_tpu AOT executable")
    meta = blob["meta"]
    env = _env_meta()
    for key in ("backend", "device_kind", "jax_version"):
        if meta.get(key) != env[key]:
            raise RuntimeError(
                f"AOT executable was compiled for {key}={meta.get(key)!r} "
                f"but this process has {key}={env[key]!r}; recompile with "
                "compile_solver on this target")
    ndev = int(meta.get("num_devices", 1))
    compiled = deserialize_and_load(
        blob["payload"], blob["in_tree"], blob["out_tree"],
        execution_devices=jax.devices()[:ndev])
    return AotSolver(compiled, meta)
