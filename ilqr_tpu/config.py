"""Solver configuration.

The reference keeps every hyperparameter as a compile-time file-scope constant
(ref: include/ilqr.h:14-25, include/boxqp.h:19-24, include/finite_diff.h:9).
Here they live in frozen dataclasses that are hashable and therefore usable as
``jax.jit`` static arguments; shape-affecting fields (iteration caps, alpha
count) stay Python ints so XLA sees static shapes.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


# The reference's hard-coded line-search schedule (ref: include/ilqr.h:24).
# These are the literal values, NOT an exact log-space — parity requires them.
DEFAULT_ALPHAS: Tuple[float, ...] = (
    1.0000, 0.5012, 0.2512, 0.1259, 0.0631,
    0.0316, 0.0158, 0.0079, 0.0040, 0.0020, 0.0010,
)


@dataclasses.dataclass(frozen=True)
class BoxQPConfig:
    """Projected-Newton boxQP hyperparameters (ref: include/boxqp.h:19-24)."""

    max_iter: int = 100           # qp_maxIter
    min_grad: float = 1e-8        # minGrad: free-subspace gradient-norm tol
    min_rel_improve: float = 1e-8  # minRelImprove
    step_dec: float = 0.6         # stepDec: Armijo backtracking factor
    min_step: float = 1e-22       # minStep
    armijo: float = 0.1           # Armijo sufficient-decrease fraction
    clamp_tol: float = 1e-4       # approx_eq tolerance (ref: boxqp.h:61-64)
    vma_axes: tuple = ()  # shard_map manual axes the solve varies over —
    # promotes the constant-initialized while_loop carries so
    # check_vma=True type-checks (utils/vma.py); set via
    # SolverConfig.with_vma_axes, not directly.


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Outer iLQR loop hyperparameters (ref: include/ilqr.h:14-25).

    ``deriv_mode``:
      - "analytic": jacfwd/hessian of the discrete step & cost (default; exact)
      - "fd": central finite differences with ``fd_eps``, matching the
        reference's stencils (ref: include/finite_diff.h) for parity runs.

    ``clamp_forward``: the reference does NOT clamp controls to the box during
    the forward rollout (ref: src/ilqr_core.cpp:322-329, a known defect kept
    for parity when False). True enables the corrected behavior.

    ``use_control_limits``: False selects the unconstrained backward pass
    (plain regularized Newton, what boxQP degenerates to with infinite box).

    ``boxqp_mode``:
      - "auto": closed-form projected solve when m == 1 (exact in one step —
        a 1-D box QP has the analytic solution clamp(−Qu/Quu); the iterative
        projected Newton is only needed for coupled dims), iterative
        projected Newton otherwise. The fast path for the m=1 flagship
        workloads.
      - "iterative": always run the reference-semantics projected Newton
        (ref: src/boxqp.cpp:26-139), including its tolerance quirks —
        required for bit-tolerant parity with the reference binary.
      - "enum": exact loop-free active-set enumeration for m ≤ 4
        (ops/boxqp.boxqp_enum, 3^m candidates) — trace-light,
        TPU-friendly, finds the true QP optimum rather than the
        reference's tolerance-limited iterate.
      - "pn_fixed": fixed-shape projected Newton for ANY m
        (ops/boxqp.boxqp_pn — the in-kernel _qp_pn recipe on the XLA
        path): m+6 unrolled Newton iterations, masked Cholesky,
        5-candidate clamped backtracking, zero data-dependent control
        flow. EXPLICIT opt-in only — measured SLOWER than the iterative
        solver on the vmap path in both throughput and trace time
        (BENCH_NOTES rounds 4-5; the scan path is latency-bound, not
        loop-bound), so "auto" never selects it; it remains the
        vmappable any-m semantics reference and the f64-friendly QP.
    """

    max_iter: int = 100
    tol_fun: float = 1e-6
    tol_grad: float = 1e-6
    full_ddp: bool = False  # include the second-order dynamics tensors
    # (Vx·fxx etc.) in the Q-term expansion — the full_DDP option of Tassa's
    # original MATLAB iLQG that the reference never implemented (its backward
    # pass is Gauss-Newton only, ref src/ilqr_core.cpp:359-363). Exact via
    # nested jacfwd; requires deriv_mode="analytic" and runs on the
    # scan/vmap path (the fused kernel-layout solver rejects it).
    lambda_init: float = 1.0
    dlambda_init: float = 1.0
    lambda_factor: float = 1.6
    lambda_max: float = 1e11
    lambda_min: float = 1e-8
    lambda_grad_term: float = 1e-5  # λ must be below this for grad termination
    z_min: float = 0.0
    alphas: Tuple[float, ...] = DEFAULT_ALPHAS
    deriv_mode: str = "analytic"
    fd_eps: float = 1e-3
    integrator: str = "euler"
    clamp_forward: bool = False
    use_control_limits: bool = True
    boxqp_mode: str = "auto"
    backward_kernel: str = "auto"  # "auto" | "xla" | "pallas": batched
    # backward sweeps use the fused Pallas TPU kernel (ops/pallas_backward)
    # when m == 1 in f32; "auto" enables it on the TPU backend only.
    rollout_kernel: str = "auto"  # same for rollouts / line searches via
    # the fused SoA rollout kernel (ops/pallas_rollout); needs model SoA fns.
    deriv_kernel: str = "auto"  # same for the analytic linearization stage
    # via the fused in-kernel-JVP derivative kernel (ops/pallas_derivs).
    backward_mode: str = "scan"  # "scan" (serial recursion) | "assoc"
    # (O(log T)-depth parallel-in-time associative scan; unconstrained
    # problems only) | "assoc_frozen" (the control-limited extension:
    # frozen-active-set refinement sweeps, each O(log T) — see
    # ops/assoc_backward.py; research-grade, serial stays the default).
    assoc_refine_sweeps: int = 2  # assoc_frozen: KKT re-freeze sweeps
    # after the unconstrained proposal (each one more O(log T) scan).
    sweep_kernel: str = "merged"  # fused-solver linearize+backward:
    # "merged" = one kernel re-deriving the model in-registers (no HBM
    # round-trip for the linearization, ops/pallas_sweep.py); "split" =
    # separate derivative + backward kernels.
    sweep_time_block: int = 32  # fused solver merged sweep kernel:
    # timesteps per grid step (processed in descending time order with
    # masked edge steps) — divides the per-grid-step DMA/pipeline
    # machinery like ls_time_block (measured: 32 beats 8 by ~250 µs per
    # iteration on the acrobot workload, BENCH_NOTES.md).
    ls_time_block: int = 32  # fused solver line-search kernel: timesteps
    # per grid step. Each grid step costs ~0.14 µs of pipeline machinery
    # on top of the model math; blocking TB steps per grid step divides
    # that machinery across the (A+1)·T candidate sweep — the dominant
    # per-iteration term (BENCH_NOTES.md). Any TB ≥ 1 is exact (edge
    # steps are masked); 1 reproduces the unblocked kernel.
    iter_kernel: str = "auto"  # fused solver: "merged" runs the WHOLE
    # iteration (backward sweep + line search + epilogue) as ONE Pallas
    # call with the gains resident in VMEM scratch — no k/K HBM round-trip
    # and one kernel launch per iteration (ops/pallas_iter.py); "split" =
    # the two-kernel path (merged sweep + line-search kernel). "auto"
    # picks "merged" whenever the gain scratch fits the VMEM budget and
    # the merged sweep is in use.
    iter_time_block: int = 16  # whole-iteration kernel: timesteps per
    # grid step. Smaller than sweep/ls_time_block because the streamed
    # in/out pipeline buffers must share VMEM with the ~10 MB resident
    # gain scratch.
    fused_unroll: int = 4  # fused solver: iterations unrolled per outer
    # while_loop step. On the axon TPU backend every loop iteration costs
    # ~0.4 ms of sync overhead (BENCH_NOTES.md loop probes); unrolling
    # amortizes it U× at the cost of a U×-larger traced body. Lanes are
    # frozen past max_iter, so results are identical for any U ≥ 1.
    vma_axes: tuple = ()  # shard_map manual axes (see BoxQPConfig.vma_axes
    # and utils/vma.py); set via with_vma_axes.
    boxqp: BoxQPConfig = dataclasses.field(default_factory=BoxQPConfig)

    def replace(self, **kw) -> "SolverConfig":
        return dataclasses.replace(self, **kw)

    def with_vma_axes(self, axes) -> "SolverConfig":
        """Config for running inside ``shard_map(..., check_vma=True)``:
        every constant-initialized loop carry in the solver (and its inner
        boxQP) is promoted to vary over ``axes`` (utils/vma.py). Used by
        parallel/mesh.py; a no-op config off the sharded path."""
        axes = tuple(axes)
        return dataclasses.replace(
            self, vma_axes=axes,
            boxqp=dataclasses.replace(self.boxqp, vma_axes=axes))


# Configuration that reproduces the reference binary bit-for-bit semantics.
PARITY_CONFIG = SolverConfig(
    deriv_mode="fd", clamp_forward=False, boxqp_mode="iterative"
)
