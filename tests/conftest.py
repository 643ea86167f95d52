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

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def repo_root():
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
