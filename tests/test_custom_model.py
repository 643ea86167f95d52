"""Custom-model registration: the user-extension path (ref: include/model.h
subclassing) — a new model defined outside the package solves, batches, and
uses the fused kernels."""

import sys
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

from custom_model import UNICYCLE, default_params  # noqa: E402

from ilqr_tpu import SolverConfig, solve
from ilqr_tpu.batch import solve_batch
from ilqr_tpu.models import get_model, register


def test_register_and_get():
    try:
        register(UNICYCLE)
    except ValueError:
        pass  # registered by another test already
    assert get_model("unicycle").n == 3
    with pytest.raises(ValueError):
        register(UNICYCLE)  # duplicate


def test_custom_model_solves_to_goal():
    p = default_params(goal=(1.5, -0.5, 0.0))
    cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True)
    sol = solve(UNICYCLE, p, cfg, 0.05, jnp.zeros(3), jnp.zeros((80, 2)))
    xf = np.asarray(sol.xs[-1])
    assert abs(xf[0] - 1.5) < 0.1 and abs(xf[1] + 0.5) < 0.1


@pytest.mark.slow
def test_custom_model_batches_and_kernels():
    p = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), default_params())
    cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                       max_iter=3, rollout_kernel="pallas",
                       deriv_kernel="pallas")
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(3, 3)) * 0.2, jnp.float32)
    sol = solve_batch(UNICYCLE, p, cfg, 0.05,
                      x0, jnp.zeros((10, 2), jnp.float32))
    assert sol.cost.shape == (3,)
    assert np.all(np.isfinite(np.asarray(sol.cost)))
