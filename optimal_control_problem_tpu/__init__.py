"""optimal_control_problem_tpu — a TPU-native MPC / trajectory-optimization
framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference C++/CasADi/OSQP-CUDA library ``LockedFlysher/optimal_control_problem``
(see SURVEY.md): symbolic problem construction, an SQP engine with an
OSQP-style ADMM inner QP solver, multiple solver backends, YAML-configured
variable layouts and bounds, and — new here — batched (vmap) and multi-chip
(mesh/shard_map) scenario MPC.
"""

from .config import Frame, OCPConfig, load_config
from .controller import MPCController
from .problem import OptimalControlProblem, SolverType
from .solvers.admm import ADMMSettings, QPSolution, admm_solve
from .solvers.qp_interface import CuCaQP, TpuQP
from .solvers.sqp import SQPOptimizationSolver, SQPOptions, SQPResult
from .stagewise import StageStructure
from . import sym

__version__ = "0.1.0"

__all__ = [
    "Frame",
    "OCPConfig",
    "load_config",
    "MPCController",
    "OptimalControlProblem",
    "SolverType",
    "ADMMSettings",
    "QPSolution",
    "admm_solve",
    "CuCaQP",
    "TpuQP",
    "SQPOptimizationSolver",
    "SQPOptions",
    "SQPResult",
    "StageStructure",
    "sym",
]
