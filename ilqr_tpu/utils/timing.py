"""Per-phase timing, the TPU equivalent of the reference's TIMESTUFF report
(ref: src/ilqr_core.cpp:2, 95-100, 290-298): total / derivatives / backward /
forward / other. Device work is asynchronous, so phases are measured with
explicit ``block_until_ready`` fences; for kernel-level detail use
``jax.profiler.trace`` (see profile())."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class PhaseTimer:
    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, *fence_on):
        start = time.perf_counter()
        yield
        for x in fence_on:
            jax.block_until_ready(x)
        dt = time.perf_counter() - start
        self.totals[name] += dt
        self.counts[name] += 1

    def report(self) -> str:
        lines = ["phase breakdown (seconds):"]
        total = sum(self.totals.values())
        for name, t in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            lines.append(f"  {name:<20s} {t:9.4f}  ({self.counts[name]} calls)")
        lines.append(f"  {'total':<20s} {total:9.4f}")
        return "\n".join(lines)


@contextlib.contextmanager
def profile(logdir: str = "/tmp/ilqr_tpu_profile"):
    """jax.profiler trace wrapper (view with tensorboard/xprof)."""
    with jax.profiler.trace(logdir):
        yield


def summarize_trace(logdir: str, top: int = 40):
    """Aggregate a ``profile()``/``jax.profiler.trace`` capture by
    (plane, event name) without tensorboard: parses the xplane protobuf
    dump directly and returns ``(planes, xplane_path)`` where planes maps
    plane name (e.g. ``/device:TPU:0``, ``/host:CPU``) to
    ``{n_events, n_lines, span_ms, top_events: [{name, total_us, count,
    mean_us}, ...]}`` sorted by total time.

    This is how the committed fused-iteration trace was reduced to the
    per-phase device table in BENCH_NOTES round 4 (per-iteration while
    body 259.7 µs etc.); see experiments/trace_probe.py for the capture
    recipe.
    """
    import glob
    import os

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {logdir}")
    path = max(paths, key=os.path.getsize)
    xspace = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xspace.ParseFromString(f.read())

    planes = {}
    for plane in xspace.planes:
        meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
        agg = {}
        n_events = 0
        span_lo, span_hi = None, 0
        for line in plane.lines:
            for ev in line.events:
                n_events += 1
                name = meta.get(ev.metadata_id, f"id{ev.metadata_id}")
                dur_us = ev.duration_ps / 1e6
                a = agg.setdefault(name, [0.0, 0])
                a[0] += dur_us
                a[1] += 1
                t0 = line.timestamp_ns * 1e3 + ev.offset_ps / 1.0
                if span_lo is None or t0 < span_lo:
                    span_lo = t0
                if t0 + ev.duration_ps > span_hi:
                    span_hi = t0 + ev.duration_ps
        top_events = sorted(agg.items(), key=lambda kv: -kv[1][0])[:top]
        planes[plane.name] = {
            "n_events": n_events,
            "n_lines": len(plane.lines),
            "span_ms": (round((span_hi - span_lo) / 1e9, 3)
                        if span_lo is not None else 0.0),
            "top_events": [
                {"name": k[:120], "total_us": round(v[0], 1),
                 "count": v[1],
                 "mean_us": round(v[0] / max(v[1], 1), 2)}
                for k, v in top_events],
        }
    return planes, path


def profile_phases(model, params, cfg, dt, x0, u0, n_iters: int = 5,
                   batch: int = 0):
    """Per-phase breakdown of one solve — the reference's TIMESTUFF report
    (ref: src/ilqr_core.cpp:95-100, 290-298: total / derivatives / backward
    / forward / other), measured with device fences around separately-jitted
    phases. ``batch`` > 0 profiles a vmapped batch of that size instead of
    a single problem. Returns (PhaseTimer, report string).
    """
    import jax.numpy as jnp

    from ilqr_tpu.ops.backward import backward_pass
    from ilqr_tpu.ops.derivatives import compute_derivs
    from ilqr_tpu.ops.rollout import line_search
    from ilqr_tpu.solver import init_state

    if batch:
        x0 = jnp.broadcast_to(x0, (batch,) + jnp.shape(x0))
        u0 = jnp.broadcast_to(u0, (batch,) + jnp.shape(u0))
        maybe_vmap = lambda f, in_axes: jax.vmap(f, in_axes=in_axes)
    else:
        maybe_vmap = lambda f, in_axes: f

    derivs_fn = jax.jit(maybe_vmap(
        lambda xs, us: compute_derivs(model, params, cfg, dt, xs, us),
        (0, 0)))
    bwd_fn = jax.jit(maybe_vmap(
        lambda d, us, lam, k_last: backward_pass(
            d, us, lam, params.u_min, params.u_max, cfg, k_last),
        (0, 0, 0, 0)))
    ls_fn = jax.jit(maybe_vmap(
        lambda x0_, xs, us, k, K, dV, c: line_search(
            model, params, cfg, dt, x0_, xs, us, k, K, dV, c),
        (0,) * 7))
    init_fn = jax.jit(maybe_vmap(
        lambda a, b: init_state(model, params, cfg, dt, a, b), (0, 0)))

    timer = PhaseTimer()
    state = init_fn(x0, u0)
    jax.block_until_ready(state.cost)

    lam = state.lam
    k_last = state.k[..., -1, :] if batch else state.k[-1]
    xs, us, cost = state.xs, state.us, state.cost

    # warm-up (compile) outside the timers
    d = derivs_fn(xs, us)
    br = bwd_fn(d, us, lam, k_last)
    ls = ls_fn(x0, xs, us, br.k, br.K, br.dV, cost)
    jax.block_until_ready(ls.cost)

    for _ in range(n_iters):
        with timer.phase("derivatives", None):
            d = derivs_fn(xs, us)
            jax.block_until_ready(d.fx)
        with timer.phase("backward_pass", None):
            br = bwd_fn(d, us, lam, k_last)
            jax.block_until_ready(br.k)
        with timer.phase("forward_pass", None):
            ls = ls_fn(x0, xs, us, br.k, br.K, br.dV, cost)
            jax.block_until_ready(ls.cost)
        with timer.phase("other", None):
            xs = jnp.where(ls.accepted[..., None, None] if batch
                           else ls.accepted, ls.xs, xs)
            us = jnp.where(ls.accepted[..., None, None] if batch
                           else ls.accepted, ls.us, us)
            cost = jnp.where(ls.accepted, ls.cost, cost)
            k_last = br.k[..., -1, :] if batch else br.k[-1]
            jax.block_until_ready(cost)

    return timer, timer.report()
