from .batch import BatchedSolver, BatchState
from .dist import DistributedSolver, consensus_mean
from .horizon import horizon_sharded_solve
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
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "initialize_distributed",
]
