"""Host-side reference NLP backends — the analogs of the reference's
CasADi-wrapped ``nlpsol`` solvers (IPOPT and ``sqpmethod``+qpOASES,
``/root/reference/src/OptimalControlProblem.cpp:259-327``).

In the TPU framework these are *validation* backends, not the hot path
(SURVEY.md section 2, native-components mapping): they solve the same NLP on
the host with scipy to convergence, providing numerical cross-checks for the
jitted TPU SQP engine.

* ``IPOPT``  -> ``scipy.optimize.minimize(method="trust-constr")``
  (an interior-point method, like IPOPT).
* ``SQP``    -> ``scipy.optimize.minimize(method="SLSQP")``
  (a sequential-quadratic-programming method, like ``sqpmethod``).

Derivatives are supplied by JAX AD on the same traced functions the TPU path
uses, so the *problem* is bit-identical across backends; only the solve
algorithm differs.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import Bounds, NonlinearConstraint, minimize

__all__ = ["solve_nlp_host"]


def solve_nlp_host(
    f_fn: Callable,
    g_fn: Optional[Callable],
    x0: np.ndarray,
    p: np.ndarray,
    lbx: np.ndarray,
    ubx: np.ndarray,
    lbg: np.ndarray,
    ubg: np.ndarray,
    method: str = "trust-constr",
    tol: float = 1e-8,
    max_iter: int = 500,
) -> Dict[str, np.ndarray]:
    """Solve ``min f(x,p) s.t. lbx<=x<=ubx, lbg<=g(x,p)<=ubg`` on the host.

    Returns ``{"x": solution, "f": objective}`` like the CasADi result map
    consumed at ``OptimalControlProblem.cpp:212``.
    """
    p = np.asarray(p, dtype=np.float64).reshape(-1)
    x0 = np.asarray(x0, dtype=np.float64).reshape(-1)
    lbx = np.asarray(lbx, dtype=np.float64).reshape(-1)
    ubx = np.asarray(ubx, dtype=np.float64).reshape(-1)

    pj = jnp.asarray(p)

    f_grad = jax.jit(jax.grad(lambda x: f_fn(x, pj)))
    f_jit = jax.jit(lambda x: f_fn(x, pj))

    def fun(x):
        return float(f_jit(jnp.asarray(x)))

    def grad(x):
        return np.asarray(f_grad(jnp.asarray(x)), dtype=np.float64)

    constraints = []
    if g_fn is not None and len(np.atleast_1d(lbg)) > 0:
        g_jit = jax.jit(lambda x: g_fn(x, pj))
        g_jac = jax.jit(jax.jacfwd(lambda x: g_fn(x, pj)))

        def gv(x):
            return np.asarray(g_jit(jnp.asarray(x)), dtype=np.float64)

        def gj(x):
            return np.asarray(g_jac(jnp.asarray(x)), dtype=np.float64)

        lbg = np.asarray(lbg, dtype=np.float64).reshape(-1)
        ubg = np.asarray(ubg, dtype=np.float64).reshape(-1)
        constraints.append(NonlinearConstraint(gv, lbg, ubg, jac=gj))

    bounds = Bounds(lbx, ubx, keep_feasible=False)

    if method == "SLSQP":
        # SLSQP needs eq/ineq constraint dicts.
        cons = []
        if constraints:
            nlc = constraints[0]
            eq_mask = np.isfinite(nlc.lb) & (nlc.lb == nlc.ub)
            ineq_lb = np.isfinite(nlc.lb) & ~eq_mask
            ineq_ub = np.isfinite(nlc.ub) & ~eq_mask
            if eq_mask.any():
                cons.append(
                    {
                        "type": "eq",
                        "fun": lambda x, m=eq_mask: (nlc.fun(x) - nlc.lb)[m],
                        "jac": lambda x, m=eq_mask: nlc.jac(x)[m],
                    }
                )
            if ineq_lb.any():
                cons.append(
                    {
                        "type": "ineq",
                        "fun": lambda x, m=ineq_lb: (nlc.fun(x) - nlc.lb)[m],
                        "jac": lambda x, m=ineq_lb: nlc.jac(x)[m],
                    }
                )
            if ineq_ub.any():
                cons.append(
                    {
                        "type": "ineq",
                        "fun": lambda x, m=ineq_ub: (nlc.ub - nlc.fun(x))[m],
                        "jac": lambda x, m=ineq_ub: -nlc.jac(x)[m],
                    }
                )
        res = minimize(
            fun,
            x0,
            jac=grad,
            bounds=bounds,
            constraints=cons,
            method="SLSQP",
            options={"maxiter": max_iter, "ftol": tol},
        )
    else:
        res = minimize(
            fun,
            x0,
            jac=grad,
            bounds=bounds,
            constraints=constraints,
            method="trust-constr",
            options={"maxiter": max_iter, "gtol": tol, "xtol": tol},
        )

    return {
        "x": np.asarray(res.x, dtype=np.float64),
        "f": np.asarray(res.fun, dtype=np.float64),
        "success": bool(res.success),
        "status": res.status,
    }
