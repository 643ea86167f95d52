"""Test harness: CPU backend with 8 virtual devices (the TPU-mesh analogue of
a fake multi-node backend — SURVEY §4), float64 enabled for parity against the
reference's double-precision Eigen math."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# Something in this image's interpreter startup rewrites JAX_PLATFORMS to
# include the axon TPU plugin; the config update below is authoritative.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent XLA compile cache: the interpret-mode fused-kernel tests are
# ~100% CPU compile time (the kernel body unrolls T×A steps; measured
# 275 s compile / 0.3 s run for one fused solve). The cache is
# multi-process safe, so xdist workers and repeat suite runs share it.
#
# Corruption auto-heal: a suite run KILLED mid-cache-write (timeout, ^C,
# OOM) can leave a truncated entry, and jax 0.9's cache READ of such an
# entry later segfaults (PYTEST_RC=139) or poisons the XLA:CPU runtime
# ("Buffer Definition Event ... not found" on unrelated deserialized
# executables) — both observed 2026-08-20/21 (CLAUDE.md). The sentinel
# below purges the cache whenever the previous run did not finish
# cleanly: one cold re-warm instead of mysterious failures.
_cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache")
_dirty_marker = os.path.join(_cache_dir, "_SUITE_IN_PROGRESS")
if os.environ.get("PYTEST_XDIST_WORKER") is None:  # controller only
    if os.path.exists(_dirty_marker):
        import shutil

        shutil.rmtree(_cache_dir, ignore_errors=True)
    os.makedirs(_cache_dir, exist_ok=True)
    with open(_dirty_marker, "w") as f:
        f.write("purge .jax_cache if this file survives a run\n")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import pytest  # noqa: E402


_worker_crashed = [False]


def pytest_handlecrashitem(crashitem, report, sched):
    # An xdist worker SEGFAULTED (observed 2026-08-21: gw3 died in
    # test_warm_start_m2 during a cold-cache 4-worker run — the
    # non-atomic cache-write race). It may have died mid-cache-write,
    # so treat the cache as suspect: keep the marker below.
    _worker_crashed[0] = True


def pytest_sessionfinish(session, exitstatus):
    # Remove the marker ONLY on clean completion (0 = all passed,
    # 1 = test failures — both mean every process exited normally and
    # flushed its cache writes) with no crashed workers. An interrupted
    # run (^C, exitstatus=2) or internal error still reaches this hook
    # via pytest's finally block, but may have killed a worker
    # mid-cache-write — leave the marker so the next run purges.
    # Limitation (documented, accepted): two CONCURRENT suite runs see
    # each other's marker and purge the live cache — don't run two
    # suites at once.
    if (os.environ.get("PYTEST_XDIST_WORKER") is None
            and exitstatus in (0, 1) and not _worker_crashed[0]):
        try:
            os.remove(_dirty_marker)
        except OSError:
            pass


@pytest.fixture(scope="session")
def repo_root():
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
