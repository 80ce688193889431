from .batch import BatchedSolver, BatchState
from .dist import DistributedSolver, consensus_mean
from .horizon import horizon_sharded_solve
from .seq_admm import ShardedBandedQP, admm_solve_seq_parallel
from .seq_sqp import sqp_solve_seq_parallel
from .sharded_solver import HorizonShardedSolver
from .mesh import (
    batch_sharding,
    initialize_distributed,
    make_mesh,
    replicated_sharding,
)

__all__ = [
    "BatchedSolver",
    "BatchState",
    "DistributedSolver",
    "consensus_mean",
    "horizon_sharded_solve",
    "ShardedBandedQP",
    "admm_solve_seq_parallel",
    "sqp_solve_seq_parallel",
    "HorizonShardedSolver",
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "initialize_distributed",
]
