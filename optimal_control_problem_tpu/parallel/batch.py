"""Batched scenario MPC — ``vmap`` over independent solves.

The reference is strictly one-problem-at-a-time (SURVEY.md section 2,
"Parallelism & distributed communication": single-process, single-GPU, one
``computeOptimalTrajectory`` per tick).  On TPU, thousands of independent
SQP solves batch into one jitted program: every ADMM matvec becomes a batched
matmul feeding the MXU, which is where the >=1e4 solves/s/chip target
(BASELINE.json config 5) comes from.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..problem import OptimalControlProblem

__all__ = ["BatchState", "BatchedSolver"]


class BatchState(NamedTuple):
    """Per-scenario persistent solver state (the batched analog of the
    reference's ``result_`` + OSQP warm start, SQPOptimizationSolver.cpp:88-91)."""

    x: jnp.ndarray  # (B, n_x) current iterates
    qp_x: jnp.ndarray  # (B, qp_n) last QP primal
    qp_y: jnp.ndarray  # (B, qp_m) last QP dual


class BatchedSolver:
    """vmap-batched front-end over a generated TPU_SQP problem.

    Usage::

        ocp = double_integrator.build()
        batched = BatchedSolver(ocp)
        state = batched.init_state(4096)
        trajs, state = batched.solve(frames, references, state)
    """

    def __init__(self, ocp: OptimalControlProblem):
        if ocp.solver is None:
            raise ValueError(
                "OCP must be generated with a TPU_SQP-capable backend "
                "(call gen_solver() with solve_method TPU_SQP/CUDA_SQP/MIXED)"
            )
        self.ocp = ocp
        self.solver = ocp.solver
        cfg = ocp.ocp_config
        self.n_x = cfg.num_variables
        self.n_p = ocp.reference_size
        self.frame_size = cfg.get_frame_size()
        self.dtype = self.solver.dtype

        lbx = cfg.lower_bounds_flat()
        ubx = cfg.upper_bounds_flat()
        self._lbx_tail = jnp.asarray(lbx, self.dtype)
        self._ubx_tail = jnp.asarray(ubx, self.dtype)
        self._lbg = jnp.asarray(ocp.get_constraint_lower_bounds(), self.dtype)
        self._ubg = jnp.asarray(ocp.get_constraint_upper_bounds(), self.dtype)

        fs = self.frame_size
        lbx_t, ubx_t = self._lbx_tail, self._ubx_tail
        lbg, ubg = self._lbg, self._ubg

        solve_batch = self.solver.solve_batch_fn
        if solve_batch is None:
            # Batch-native banded path: the whole scenario batch iterates in
            # the fused batch-last Pallas chunk (nonlinear models rebuild
            # per-scenario operators each SQP step).  Measured well above the
            # vmapped per-scenario XLA loop (docs/PERFORMANCE.md).
            solve_batch = getattr(self.solver, "solve_batch_banded_fn", None)
        if solve_batch is not None:
            # Whole-batch program: shared-system GEMM-ADMM or banded Pallas.

            def batched(frames, references, x, qp_x, qp_y):
                B = frames.shape[0]
                lbx = jnp.broadcast_to(lbx_t, (B, lbx_t.shape[0]))
                ubx = jnp.broadcast_to(ubx_t, (B, ubx_t.shape[0]))
                # First-frame pinning per scenario (cpp:93-96).
                lbx = lbx.at[:, :fs].set(frames)
                ubx = ubx.at[:, :fs].set(frames)
                lbg_b = jnp.broadcast_to(lbg, (B, lbg.shape[0]))
                ubg_b = jnp.broadcast_to(ubg, (B, ubg.shape[0]))
                return solve_batch(
                    x, references, lbx, ubx, lbg_b, ubg_b, qp_x, qp_y
                )

            self._batched_res = jax.jit(batched)
        else:
            solve_fn = self.solver.solve_fn

            def one(frame, reference, x, qp_x, qp_y):
                # First-frame pinning per scenario (cpp:93-96).
                lbx_i = lbx_t.at[:fs].set(frame)
                ubx_i = ubx_t.at[:fs].set(frame)
                return solve_fn(
                    x, reference, lbx_i, ubx_i, lbg, ubg, qp_x, qp_y
                )

            self._batched_res = jax.jit(jax.vmap(one))

        def slim(frames, references, x, qp_x, qp_y):
            res = self._batched_res(frames, references, x, qp_x, qp_y)
            return res.x, res.f, res.qp_x, res.qp_y

        self._batched = jax.jit(slim)
        # Full SQPResult of the last .solve() call (per-scenario f_history,
        # qp_iters, step_norms, and — on the banded/per-scenario paths —
        # per-step QP convergence/infeasibility flags).
        self.last_result = None

    # ------------------------------------------------------------------
    def init_state(self, batch: int, x0: Optional[np.ndarray] = None) -> BatchState:
        s = self.solver
        x = (
            jnp.zeros((batch, self.n_x), self.dtype)
            if x0 is None
            else jnp.broadcast_to(
                jnp.asarray(x0, self.dtype), (batch, self.n_x)
            )
        )
        return BatchState(
            x=x,
            qp_x=jnp.zeros((batch, s._qp_n), self.dtype),
            qp_y=jnp.zeros((batch, s._qp_m), self.dtype),
        )

    def solve(self, frames, references, state: BatchState):
        """One batched MPC tick.

        ``frames``: (B, frame_size) measured states; ``references``: (B, n_p).
        Returns ``(trajectories (B, n_x), objectives (B,), new_state)``.
        """
        frames = jnp.asarray(frames, self.dtype)
        references = jnp.asarray(references, self.dtype)
        res = self._batched_res(
            frames, references, state.x, state.qp_x, state.qp_y
        )
        self.last_result = res
        return res.x, res.f, BatchState(x=res.x, qp_x=res.qp_x, qp_y=res.qp_y)

    @property
    def solve_jit(self):
        """The raw jitted batched function
        ``(frames, refs, x, qp_x, qp_y) -> (x, f, qp_x, qp_y)`` for
        composition with sharding (see parallel/dist.py)."""
        return self._batched
