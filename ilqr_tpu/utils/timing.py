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
