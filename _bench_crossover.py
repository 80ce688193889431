"""Measure the banded_solver crossover: block-Thomas scan vs cyclic reduction.

``ADMMSettings.banded_solver`` ("thomas" | "cr") claims (docs/TUNING.md)
that CR wins for small batches / long horizons where the Thomas scan's
sequential latency dominates.  VERDICT round-3 weak #7: no committed number
supports the claim.  This sweeps h x B on the real TPU for both solvers on
the vmapped XLA banded path (the path that owns the knob; the fused batch
kernel is Thomas-only by design) and prints a JSON line per cell.

Forced iteration budget (eps=0, max_iter=100) so both solvers run the
identical iteration count and the timing isolates the x-update solve.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from optimal_control_problem_tpu.solvers.admm import ADMMSettings
from optimal_control_problem_tpu.solvers.admm_banded import (
    BandedQP,
    admm_solve_banded,
)
from optimal_control_problem_tpu.utils.serialization import (
    enable_compilation_cache,
)

enable_compilation_cache()


def make_qp(N, w=5, r=4, r2=1, seed=0):
    rng = np.random.default_rng(seed)
    Hb = np.zeros((N, w, w), np.float32)
    for k in range(N):
        L = rng.normal(size=(w, w)) * 0.3
        Hb[k] = (L @ L.T + np.eye(w)).astype(np.float32)
    J0 = rng.normal(size=(N - 1, r, w)).astype(np.float32) * 0.5
    J1 = np.tile(-np.eye(r, w, dtype=np.float32)[None], (N - 1, 1, 1))
    Jc = rng.normal(size=(N, r2, w)).astype(np.float32) * 0.5
    n = N * w
    m = n + (N - 1) * r + N * r2
    q = rng.normal(size=(n,)).astype(np.float32)
    l = np.full((m,), -2.0, np.float32)
    u = np.full((m,), 2.0, np.float32)
    # dynamics rows are equalities
    l[n : n + (N - 1) * r] = 0.0
    u[n : n + (N - 1) * r] = 0.0
    return BandedQP(
        Hb=jnp.asarray(Hb), J0=jnp.asarray(J0), J1=jnp.asarray(J1),
        Jc=jnp.asarray(Jc), q=jnp.asarray(q), l=jnp.asarray(l),
        u=jnp.asarray(u),
    )


def main():
    for N in (100, 200, 500):
        qp1 = make_qp(N)
        for B in (8, 64, 256):
            qp_b = jax.tree_util.tree_map(
                lambda a: jnp.broadcast_to(a[None], (B,) + a.shape), qp1
            )
            row = {"horizon": N, "batch": B}
            for solver in ("thomas", "cr"):
                st = ADMMSettings(
                    method="banded", banded_solver=solver,
                    eps_abs=0.0, eps_rel=0.0, max_iter=100,
                    adaptive_rho=False, check_infeasibility=False,
                    scaling_iters=3,
                )
                # Chain reps by a REAL data dependency and end each window
                # with a host read.  The round-4 harness chained via
                # ``q + 0.0 * carry`` — algebraically inert, so XLA folds
                # the dependency away, every rep is the identical program
                # on identical inputs, and the relay served repeats fast
                # enough to produce physically impossible timings (~40 us
                # for 100 forced h500 iterations; VERDICT round-4 weak #4).
                # Feeding the previous solution into the WARM START cannot
                # fold (it changes the iterates), does not change the
                # iteration count (forced budget), and keeps the per-rep
                # compute identical.
                fn = jax.jit(
                    jax.vmap(
                        lambda q_, b_: admm_solve_banded(
                            q_, st, x0=1e-3 * b_
                        ).x
                    )
                )
                carry = jnp.zeros_like(qp_b.q)
                carry = fn(qp_b, carry)
                float(jnp.sum(carry))
                times = []
                reps = 3
                for _ in range(3):
                    t0 = time.perf_counter()
                    for _ in range(reps):
                        carry = fn(qp_b, carry)
                    s = float(jnp.sum(carry))
                    times.append((time.perf_counter() - t0) / reps)
                    assert np.isfinite(s)
                row[f"{solver}_ms"] = round(
                    float(np.median(times)) * 1e3, 3
                )
            row["winner"] = (
                "thomas" if row["thomas_ms"] <= row["cr_ms"] else "cr"
            )
            row["speedup"] = round(
                max(row["thomas_ms"], row["cr_ms"])
                / max(min(row["thomas_ms"], row["cr_ms"]), 1e-9),
                2,
            )
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
