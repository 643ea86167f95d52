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
_cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def repo_root():
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
