"""Profiling utilities — the analog of the reference's per-phase wall-clock
instrumentation in the SQP loop (``SQPOptimizationSolver.cpp:133-213``: per-
iteration local-system ms, QP ms, totals, percentage split).

Under jit the whole solve is one fused program, so the reference's inline
timers cannot exist on the hot path.  Instead :func:`profile_solver` times the
two phases as separately jitted programs (same computations, excluded from the
production path) and reports the same local-system / QP breakdown; and
:class:`Timer` provides simple wall-clock phase timing with
``block_until_ready`` for host-side benchmarking.  For deep dives use
``jax.profiler.trace`` around the jitted call.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Timer", "profile_solver"]


class Timer:
    """Accumulating phase timer (host wall clock, device-synchronized)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextmanager
    def phase(self, name: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync() if callable(sync) else sync)
            dt = (time.perf_counter() - t0) * 1e3
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        total = sum(self.totals.values())
        lines = [f"total: {total:.3f} ms"]
        for name, ms in self.totals.items():
            pct = 100.0 * ms / total if total > 0 else 0.0
            lines.append(
                f"  {name}: {ms:.3f} ms ({pct:.1f}%) over {self.counts[name]} calls"
            )
        return "\n".join(lines)


def profile_solver(
    solver,
    arg: Dict,
    repeats: int = 10,
) -> Dict[str, float]:
    """Measure the local-system vs QP time split for one SQP configuration.

    Mirrors the metric the reference prints when verbose
    (``SQPOptimizationSolver.cpp:204-209``): ``local_system_ms`` (derivative
    evaluation + matrix assembly) and ``qp_ms`` (ADMM solve), per SQP
    iteration, plus the fused end-to-end ``solve_ms``.
    """
    from ..solvers.admm import admm_solve

    dt = solver.dtype
    lbx = jnp.asarray(arg["lbx"], dt).reshape(-1)
    ubx = jnp.asarray(arg["ubx"], dt).reshape(-1)
    lbg = jnp.asarray(arg.get("lbg", np.zeros(0)), dt).reshape(-1)
    ubg = jnp.asarray(arg.get("ubg", np.zeros(0)), dt).reshape(-1)
    p = jnp.asarray(arg.get("p", np.zeros(solver.n_p)), dt).reshape(-1)
    x = jnp.asarray(arg.get("x0", np.zeros(solver.n_x)), dt).reshape(-1)

    local_fn = jax.jit(solver.local_system)
    st = solver.options.admm

    def qp_only(H, g, A, low, up):
        return admm_solve(H, g, A, low, up, st)

    qp_fn = jax.jit(qp_only)

    # Warm up compiles.
    H, g, A, low, up = jax.block_until_ready(local_fn(x, p, lbx, ubx, lbg, ubg))
    sol = jax.block_until_ready(qp_fn(H, g, A, low, up))
    full_args = (
        x,
        p,
        lbx,
        ubx,
        lbg,
        ubg,
        jnp.zeros((solver._qp_n,), dt),
        jnp.zeros((solver._qp_m,), dt),
    )
    jax.block_until_ready(solver.solve_fn(*full_args))

    t0 = time.perf_counter()
    for _ in range(repeats):
        out = local_fn(x, p, lbx, ubx, lbg, ubg)
    jax.block_until_ready(out)
    local_ms = (time.perf_counter() - t0) * 1e3 / repeats

    t0 = time.perf_counter()
    for _ in range(repeats):
        sol = qp_fn(H, g, A, low, up)
    jax.block_until_ready(sol)
    qp_ms = (time.perf_counter() - t0) * 1e3 / repeats

    t0 = time.perf_counter()
    for _ in range(repeats):
        res = solver.solve_fn(*full_args)
    jax.block_until_ready(res)
    solve_ms = (time.perf_counter() - t0) * 1e3 / repeats

    denom = local_ms + qp_ms
    return {
        "local_system_ms": local_ms,
        "qp_ms": qp_ms,
        "local_system_pct": 100.0 * local_ms / denom if denom else 0.0,
        "qp_pct": 100.0 * qp_ms / denom if denom else 0.0,
        "solve_ms": solve_ms,
        "sqp_iters": solver.options.max_iter,
    }
