"""Trace-level check_vma coverage for the Mosaic (compiled-kernel) paths.

On TPU the sharded solvers run their Pallas kernels compiled, and
``shard_map(..., check_vma=True)`` type-checks the varying-manual-axes of
every value at TRACE time — including the ``vma=`` declarations on each
``pallas_call``'s out ShapeDtypeStructs (utils/vma.sds) and the promotion
of constant-initialized loop carries (utils/vma.vary). That typing is
platform-independent, so these tests trace the exact compiled-path program
on CPU via ``jax.eval_shape`` with kernel dispatch forced to compiled mode
(no execution — Mosaic lowering never runs).

Execution-level replication safety is covered elsewhere
(test_sharding.py bit-exact sharded-vs-local tests); these tests pin the
type-level contract that used to be silently broken on TPU meshes (any
sharded solve with kernels engaged raised "`vma` on `jax.ShapeDtypeStruct`
must not be `None`" before the threading landed).

Interpret mode stays check_vma=False: interpret-mode ``pallas_call``
evaluates the kernel jaxpr through an internal grid while_loop whose
carries cannot carry vma (jax 0.9) — see make_sharded_fused_solver.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ilqr_tpu import SolverConfig, get_model
from ilqr_tpu.models import acrobot, quadrotor
from ilqr_tpu.parallel.mesh import (
    make_mesh,
    make_sharded_fused_solver,
    make_sharded_solver,
)


@pytest.fixture
def force_compiled():
    """Force compiled-kernel dispatch off-TPU (trace only — never run)."""
    import ilqr_tpu.ops.rollout as ro

    ro._INTERPRET_OVERRIDE = False
    yield
    ro._INTERPRET_OVERRIDE = None


def _trace(run, params, n, m, B=64, T=12):
    x0 = jnp.zeros((B, n), jnp.float32)
    u0 = jnp.zeros((B, T, m), jnp.float32)
    out = jax.eval_shape(run.jitted, params, jnp.float32(0.01), x0, u0)
    assert out.cost.shape == (B,)


@pytest.mark.slow  # tracing the full fused program is ~90 s cold
def test_fused_sharded_traces_with_check_vma_iter_kernel():
    # acrobot (m=1, small body) auto-selects the whole-iteration kernel
    model = get_model("acrobot")
    run = make_sharded_fused_solver(
        model, SolverConfig(max_iter=6), make_mesh(), interpret=False)
    _trace(run, acrobot.default_params(), model.n, model.m)


@pytest.mark.slow  # ~110 s trace (m=4 sweep body)
def test_fused_sharded_traces_with_check_vma_two_kernel_m4():
    # quadrotor (m=4, m*n>=32) takes the two-kernel merged-sweep path
    model = get_model("quadrotor")
    run = make_sharded_fused_solver(
        model, SolverConfig(max_iter=4), make_mesh(), interpret=False)
    _trace(run, quadrotor.default_params(), model.n, model.m, T=8)


def test_fused_sharded_traces_with_check_vma_split_kernels():
    # m=1 split path: derivative kernel + split backward kernel + epilogue
    model = get_model("acrobot")
    cfg = SolverConfig(max_iter=6, sweep_kernel="split", iter_kernel="split")
    run = make_sharded_fused_solver(model, cfg, make_mesh(),
                                    interpret=False)
    _trace(run, acrobot.default_params(), model.n, model.m)


def test_vmap_sharded_traces_with_check_vma_compiled_kernels(force_compiled):
    # The vmap solver path engages its kernels through custom_vmap on TPU;
    # trace that combination (compiled dispatch) under check_vma=True.
    model = get_model("acrobot")
    cfg = SolverConfig(max_iter=6, rollout_kernel="pallas",
                       backward_kernel="pallas", deriv_kernel="pallas")
    run = make_sharded_solver(model, cfg, make_mesh())
    _trace(run, acrobot.default_params(), model.n, model.m)


@pytest.mark.slow  # interpret-mode execution; replication safety is
# also covered by test_sharding.py's bit-exact sharded-vs-local test
def test_fused_sharded_interpret_mode_keeps_vma_off():
    # Off-TPU execution must keep the checker off (jax interpret-mode
    # limitation) — the auto rule picks interpret=True on CPU.
    model = get_model("double_integrator")
    from ilqr_tpu.models import double_integrator as di

    run = make_sharded_fused_solver(model, SolverConfig(max_iter=4),
                                    make_mesh())
    B, T = 16, 6
    x0 = np.ones((B, model.n), np.float32)
    u0 = np.zeros((B, T, model.m), np.float32)
    sol = run(di.default_params(), 0.05, x0, u0)
    assert np.all(np.isfinite(np.asarray(sol.cost)))
