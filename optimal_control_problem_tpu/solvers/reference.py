"""Host-side reference NLP backends — the analogs of the reference's
CasADi-wrapped ``nlpsol`` solvers (IPOPT and ``sqpmethod``+qpOASES,
``/root/reference/src/OptimalControlProblem.cpp:259-327``).

In the TPU framework these are *validation* backends, not the hot path
(SURVEY.md section 2, native-components mapping): they solve the same NLP on
the host with scipy to convergence, providing numerical cross-checks for the
jitted TPU SQP engine.

* ``IPOPT``  -> ``scipy.optimize.minimize(method="trust-constr")``
  (an interior-point method, like IPOPT), with SLSQP fallback on failure.
* ``SQP``    -> ``scipy.optimize.minimize(method="SLSQP")``
  (a sequential-quadratic-programming method, like ``sqpmethod``).

Derivatives are supplied by JAX AD on the same traced functions the TPU path
uses — evaluated in float64 (``jax.enable_x64``) because the
host solvers' 1e-8 tolerances are unreachable with float32 gradients, while
the problem definition stays bit-identical across backends (the reference
likewise evaluates CasADi symbolics in f64 while its QP runs in f32,
``cuda_install.sh:44``).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import Bounds, NonlinearConstraint, minimize

__all__ = ["solve_nlp_host"]


def _make_f64_evaluators(f_fn: Callable, g_fn: Optional[Callable], p: np.ndarray):
    """float64 host evaluators for f, grad f, g, jac g."""
    with jax.enable_x64():
        pj = jnp.asarray(p, jnp.float64)
        f_jit = jax.jit(lambda x: f_fn(x, pj))
        f_grad = jax.jit(jax.grad(lambda x: f_fn(x, pj)))
        g_jit = jax.jit(lambda x: g_fn(x, pj)) if g_fn is not None else None
        g_jac = (
            jax.jit(jax.jacfwd(lambda x: g_fn(x, pj)))
            if g_fn is not None
            else None
        )

    def fun(x):
        with jax.enable_x64():
            return float(f_jit(jnp.asarray(x, jnp.float64)))

    def grad(x):
        with jax.enable_x64():
            return np.asarray(f_grad(jnp.asarray(x, jnp.float64)), np.float64)

    if g_fn is None:
        return fun, grad, None, None

    def gv(x):
        with jax.enable_x64():
            return np.asarray(g_jit(jnp.asarray(x, jnp.float64)), np.float64)

    def gj(x):
        with jax.enable_x64():
            return np.asarray(g_jac(jnp.asarray(x, jnp.float64)), np.float64)

    return fun, grad, gv, gj


def _slsqp(fun, grad, gv, gj, x0, lbx, ubx, lbg, ubg, tol, max_iter):
    bounds = Bounds(lbx, ubx, keep_feasible=False)
    cons = []
    if gv is not None and lbg.size:
        eq_mask = np.isfinite(lbg) & (lbg == ubg)
        ineq_lb = np.isfinite(lbg) & ~eq_mask
        ineq_ub = np.isfinite(ubg) & ~eq_mask
        if eq_mask.any():
            cons.append(
                {
                    "type": "eq",
                    "fun": lambda x, m=eq_mask: (gv(x) - lbg)[m],
                    "jac": lambda x, m=eq_mask: gj(x)[m],
                }
            )
        if ineq_lb.any():
            cons.append(
                {
                    "type": "ineq",
                    "fun": lambda x, m=ineq_lb: (gv(x) - lbg)[m],
                    "jac": lambda x, m=ineq_lb: gj(x)[m],
                }
            )
        if ineq_ub.any():
            cons.append(
                {
                    "type": "ineq",
                    "fun": lambda x, m=ineq_ub: (ubg - gv(x))[m],
                    "jac": lambda x, m=ineq_ub: -gj(x)[m],
                }
            )
    return minimize(
        fun,
        x0,
        jac=grad,
        bounds=bounds,
        constraints=cons,
        method="SLSQP",
        options={"maxiter": max_iter, "ftol": tol},
    )


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
    max_iter: int = 1000,
) -> Dict[str, np.ndarray]:
    """Solve ``min f(x,p) s.t. lbx<=x<=ubx, lbg<=g(x,p)<=ubg`` on the host.

    Returns ``{"x": solution, "f": objective, "success", "status"}`` like the
    CasADi result map consumed at ``OptimalControlProblem.cpp:212``.
    """
    p = np.asarray(p, dtype=np.float64).reshape(-1)
    x0 = np.asarray(x0, dtype=np.float64).reshape(-1)
    lbx = np.asarray(lbx, dtype=np.float64).reshape(-1)
    ubx = np.asarray(ubx, dtype=np.float64).reshape(-1)
    lbg = np.asarray(lbg, dtype=np.float64).reshape(-1)
    ubg = np.asarray(ubg, dtype=np.float64).reshape(-1)

    fun, grad, gv, gj = _make_f64_evaluators(f_fn, g_fn, p)

    def _violation(x):
        v = max(
            float(np.maximum(lbx - x, 0).max(initial=0.0)),
            float(np.maximum(x - ubx, 0).max(initial=0.0)),
        )
        if gv is not None and lbg.size:
            gx = gv(x)
            v = max(
                v,
                float(np.maximum(lbg - gx, 0).max(initial=0.0)),
                float(np.maximum(gx - ubg, 0).max(initial=0.0)),
            )
        return v

    if method == "SLSQP":
        res = _slsqp(fun, grad, gv, gj, x0, lbx, ubx, lbg, ubg, tol, max_iter)
    else:
        # MPC problems pin the first frame with lbx == ubx (cpp:93-96) —
        # an empty interior that makes pure interior-point methods stop
        # early on xtol.  Run both host methods and keep the best feasible
        # solution; this is a validation backend, accuracy beats speed.
        constraints = (
            [NonlinearConstraint(gv, lbg, ubg, jac=gj)]
            if gv is not None and lbg.size
            else []
        )
        res = minimize(
            fun,
            x0,
            jac=grad,
            bounds=Bounds(lbx, ubx, keep_feasible=False),
            constraints=constraints,
            method="trust-constr",
            options={"maxiter": max_iter, "gtol": tol, "xtol": 1e-12},
        )
        res_fb = _slsqp(
            fun, grad, gv, gj, x0, lbx, ubx, lbg, ubg, 1e-12, max_iter
        )
        if res_fb.success and _violation(res_fb.x) < 1e-6 and (
            not res.success
            or _violation(res.x) > 1e-6
            or res_fb.fun < res.fun
        ):
            res = res_fb

    return {
        "x": np.asarray(res.x, dtype=np.float64),
        "f": np.asarray(res.fun, dtype=np.float64),
        "success": bool(res.success),
        "status": res.status,
    }
