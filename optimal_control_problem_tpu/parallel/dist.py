"""Multi-chip scenario MPC: sharded batched solves + consensus collectives.

Two layers (SURVEY.md section 2, parallelism table):

* **Sharded batch solve** — the scenario batch is sharded over the mesh's
  ``batch`` axis with ``NamedSharding``; the batched SQP program runs
  embarrassingly parallel on each chip's shard (XLA/GSPMD partitions it, no
  communication on the hot path).
* **Consensus step** — multi-scenario MPC consensus on the *shared first
  control*: a ``shard_map``-ed ``psum`` average over the mesh axis (ICI
  collective), the OCP analog of a data-parallel gradient all-reduce.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .batch import BatchedSolver, BatchState
from .mesh import batch_sharding, make_mesh

__all__ = ["DistributedSolver", "consensus_mean"]


def consensus_mean(values: jnp.ndarray, mesh: Mesh, axis: str = "batch"):
    """Mean over ALL scenarios of a per-scenario quantity, across chips.

    ``values``: (B, d) sharded over ``axis``.  Returns the replicated global
    mean of shape (d,) — computed shard-locally then ``psum``-reduced over
    ICI.
    """

    def local_mean(v):
        # v: local shard (B/n, d)
        s = jnp.sum(v, axis=0)
        total = jax.lax.psum(s, axis)
        count = jax.lax.psum(jnp.asarray(v.shape[0], v.dtype), axis)
        return total / count

    return jax.shard_map(
        local_mean,
        mesh=mesh,
        in_specs=P(axis, None),
        out_specs=P(),
    )(values)


class DistributedSolver:
    """Shards a :class:`BatchedSolver` over a device mesh.

    The global batch must be divisible by the mesh's batch-axis size.  All
    arrays are placed with ``NamedSharding`` so XLA partitions the jitted
    solve across chips; warm-start state stays resident and sharded on
    device between ticks.
    """

    def __init__(
        self,
        batched: BatchedSolver,
        mesh: Optional[Mesh] = None,
        axis: str = "batch",
    ):
        self.batched = batched
        self.mesh = mesh if mesh is not None else make_mesh((axis,))
        self.axis = axis
        self.sharding = batch_sharding(self.mesh, axis)
        self.n_devices = self.mesh.devices.size

    def _shard(self, arr):
        return jax.device_put(arr, self.sharding)

    def init_state(self, batch: int, x0=None) -> BatchState:
        if batch % self.n_devices:
            raise ValueError(
                f"batch {batch} not divisible by mesh size {self.n_devices}"
            )
        state = self.batched.init_state(batch, x0)
        return BatchState(*(self._shard(a) for a in state))

    def solve(self, frames, references, state: BatchState):
        """One sharded batched MPC tick; returns sharded outputs."""
        frames = self._shard(jnp.asarray(frames, self.batched.dtype))
        references = self._shard(jnp.asarray(references, self.batched.dtype))
        x, f, qp_x, qp_y = self.batched.solve_jit(
            frames, references, state.x, state.qp_x, state.qp_y
        )
        return x, f, BatchState(x=x, qp_x=qp_x, qp_y=qp_y)

    def consensus_first_control(
        self, trajectories: jnp.ndarray, field_slice: slice
    ) -> jnp.ndarray:
        """Scenario-consensus control: average the given first-frame field
        across all scenarios (ICI ``psum``), e.g. the control entries of
        frame 0.  Returns the replicated consensus vector."""
        fs = self.batched.frame_size
        first_frames = trajectories[:, :fs]
        controls = first_frames[:, field_slice]
        return consensus_mean(controls, self.mesh, self.axis)
