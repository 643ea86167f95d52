"""ilqr_tpu — a TPU-native iLQR/DDP trajectory-optimization framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the C++/Eigen
reference implementation kazuotani14/iLQR (control-limited DDP after Tassa,
Mansard, Todorov, ICRA 2014):

- functional models (pure ``dynamics``/``cost``/``final_cost`` over pytree params)
  instead of virtual dispatch (ref: include/model.h:8-10)
- batched analytic (``jacfwd``/``hessian``) and finite-difference linearization
  instead of per-timestep FD loops (ref: src/derivatives.cpp)
- the backward Riccati/DDP recursion as a ``lax.scan`` with Levenberg-Marquardt
  regularization (ref: src/ilqr_core.cpp:350-401)
- the projected-Newton boxQP for control limits as masked, fixed-shape device
  code (ref: src/boxqp.cpp:26-139)
- the 11-candidate backtracking line search evaluated as ONE vmapped rollout
  (ref: src/ilqr_core.cpp:184-226 does this serially)
- thousands of independent solves batched via ``vmap`` and sharded over a TPU
  mesh with ``shard_map`` (the reference is strictly single-thread/process).
"""

from ilqr_tpu.config import BoxQPConfig, SolverConfig
from ilqr_tpu.types import Solution, SolverState, TerminationReason
from ilqr_tpu.models import Model, get_model, list_models
from ilqr_tpu.solver import init_state, solve, solve_verbose, solve_warm
from ilqr_tpu.batch import solve_batch, solve_batch_chunked
from ilqr_tpu.fused import solve_batch_fused
from ilqr_tpu.ops.boxqp import boxqp, boxqp_pn
from ilqr_tpu.serve import SolverService
from ilqr_tpu.aot import AotSolver, compile_solver as aot_compile, load as aot_load

__version__ = "0.1.0"

__all__ = [
    "BoxQPConfig",
    "SolverConfig",
    "Solution",
    "SolverState",
    "TerminationReason",
    "Model",
    "get_model",
    "list_models",
    "init_state",
    "solve",
    "solve_verbose",
    "solve_warm",
    "solve_batch",
    "solve_batch_chunked",
    "solve_batch_fused",
    "boxqp",
    "boxqp_pn",
    "SolverService",
    "AotSolver",
    "aot_compile",
    "aot_load",
]
