"""Auto-mode engagement envelope for the per-stage (vmap-path) kernels.

The per-stage rollout/derivs kernels are TPU-proven at m <= 8; at m=12 the
auto-engaged kernels crashed the TPU worker with a kernel fault
(experiments/round4_log.txt 2026-08-20 11:53).  "auto" must therefore cap
at MAX_STAGE_KERNEL_M while explicit "pallas" still forces engagement
(user opt-in, e.g. to re-test after a Mosaic fix).
"""

import jax
import jax.numpy as jnp
import pytest

from ilqr_tpu.config import SolverConfig
from ilqr_tpu.models import get_model
from ilqr_tpu.ops.derivatives import _use_fused_derivs
from ilqr_tpu.ops.rollout import MAX_STAGE_KERNEL_M, _use_fused


@pytest.fixture
def on_tpu(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")


def test_auto_engages_within_envelope(on_tpu):
    cfg = SolverConfig()
    for name in ("acrobot", "quadrotor", "free_flyer"):  # m = 1, 4, 8
        model = get_model(name)
        assert model.m <= MAX_STAGE_KERNEL_M
        assert _use_fused(model, cfg, jnp.float32)
        assert _use_fused_derivs(model, cfg, jnp.float32)


def test_auto_caps_at_proven_width(on_tpu):
    model = get_model("thruster_ring")  # m = 12 > MAX_STAGE_KERNEL_M
    cfg = SolverConfig()
    assert not _use_fused(model, cfg, jnp.float32)
    assert not _use_fused_derivs(model, cfg, jnp.float32)


def test_explicit_pallas_overrides_cap(on_tpu):
    model = get_model("thruster_ring")
    cfg = SolverConfig(rollout_kernel="pallas", deriv_kernel="pallas")
    assert _use_fused(model, cfg, jnp.float32)
    assert _use_fused_derivs(model, cfg, jnp.float32)


def test_xla_pin_always_wins(on_tpu):
    model = get_model("acrobot")
    cfg = SolverConfig(rollout_kernel="xla", deriv_kernel="xla")
    assert not _use_fused(model, cfg, jnp.float32)
    assert not _use_fused_derivs(model, cfg, jnp.float32)
