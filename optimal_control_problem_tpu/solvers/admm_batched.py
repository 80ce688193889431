"""Shared-system batched ADMM — the MXU-saturating fast path.

For LQ/LTI optimal-control problems (quadratic cost, linear dynamics — e.g.
the flagship double-integrator benchmark, BASELINE.json config 1/5) the QP
matrices ``P`` (objective Hessian) and ``A`` (constraint Jacobian) are
INDEPENDENT of the iterate and of the scenario: only the linear term ``q``
and the bounds ``l, u`` differ across scenarios and SQP iterations.

Where the reference solves each scenario's QP separately on the GPU (one OSQP
instance, re-setup per SQP iteration — ``SQPOptimizationSolver.cpp:155-157``),
here ONE factorization (dense inverse of the condensed or quasi-definite KKT
operator) is shared by the entire scenario batch, and every ADMM iteration
is two/three real matmuls over the batch::

    rhs (B,n)  = sigma*x - q + (rho*z - y) @ A          # (B,m)@(m,n) MXU
    xt  (B,n)  = rhs @ OP                               # (B,n)@(n,n) MXU
    zt  (B,m)  = xt @ A^T                               # (B,n)@(n,m) MXU

plus elementwise projection/dual updates (VPU, fused by XLA).  This is the
TPU-first answer to the CUDA backend: no sparse LDL, no per-problem solver
state — just large batched GEMMs.

Semantics match :mod:`.admm` (OSQP v1.0.0-beta1 as configured by the
reference): Ruiz equilibration, per-row rho with equality scaling, relaxation
alpha, sigma regularization, relative+absolute termination at eps 1e-3
(``SQPOptimizationSolver.cpp:80-85``), float32.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .admm import (
    ADMMSettings,
    _RHO_EQ_OVER_RHO_INEQ,
    _RHO_MAX,
    _RHO_MIN,
    _RHO_TOL,
    _limit_scaling,
    ruiz_equilibrate,
)

__all__ = ["BatchQPSolution", "admm_solve_shared"]


class BatchQPSolution(NamedTuple):
    x: jnp.ndarray  # (B, n)
    y: jnp.ndarray  # (B, m)
    z: jnp.ndarray  # (B, m)
    iters: jnp.ndarray  # scalar int32: iterations until ALL converged
    converged: jnp.ndarray  # (B,) bool
    r_prim: jnp.ndarray  # (B,)
    r_dual: jnp.ndarray  # (B,)


def _shared_rho_vec(l, u, rho, dtype):
    """Per-row rho from structural bound types, shared across the batch.

    A row is treated as equality / loose only if EVERY scenario agrees —
    bound types come from the problem structure (pinned first frame, dynamics
    equalities, box rows), which is scenario-independent.
    """
    loose = jnp.all(jnp.logical_and(l <= -jnp.inf, u >= jnp.inf), axis=0)
    eq = jnp.all((u - l) < _RHO_TOL, axis=0)
    rho_v = jnp.full(l.shape[1:], rho, dtype)
    rho_v = jnp.where(
        eq, jnp.clip(rho * _RHO_EQ_OVER_RHO_INEQ, _RHO_MIN, _RHO_MAX), rho_v
    )
    rho_v = jnp.where(loose, _RHO_MIN, rho_v)
    return rho_v


def _factor_shared(Pb, Ab, rho_v, sigma, method: str):
    n = Pb.shape[0]
    m = Ab.shape[0]
    if method == "condensed":
        M = Pb + sigma * jnp.eye(n, dtype=Pb.dtype) + (Ab.T * rho_v[None, :]) @ Ab
        return jnp.linalg.inv(M)
    K = jnp.zeros((n + m, n + m), dtype=Pb.dtype)
    K = K.at[:n, :n].set(Pb + sigma * jnp.eye(n, dtype=Pb.dtype))
    K = K.at[:n, n:].set(Ab.T)
    K = K.at[n:, :n].set(Ab)
    K = K.at[n:, n:].set(jnp.diag(-1.0 / rho_v))
    return jnp.linalg.inv(K)


@partial(jax.jit, static_argnames=("settings",))
def admm_solve_shared(
    P: jnp.ndarray,  # (n, n) shared
    A: jnp.ndarray,  # (m, n) shared
    q: jnp.ndarray,  # (B, n) per scenario
    l: jnp.ndarray,  # (B, m)
    u: jnp.ndarray,  # (B, m)
    settings: ADMMSettings = ADMMSettings(),
    x0: Optional[jnp.ndarray] = None,  # (B, n)
    y0: Optional[jnp.ndarray] = None,  # (B, m)
) -> BatchQPSolution:
    """Solve B QPs sharing (P, A).  Runs until every scenario meets the OSQP
    termination criteria or ``max_iter``."""
    dtype = P.dtype
    B, n = q.shape
    m = A.shape[0]
    st = settings
    sigma = jnp.asarray(st.sigma, dtype)
    alpha = jnp.asarray(st.alpha, dtype)
    l = jnp.minimum(l.astype(dtype), u.astype(dtype))
    u = u.astype(dtype)
    q = q.astype(dtype)

    # Ruiz equilibration on the shared matrices; cost scaling from the batch
    # mean so the factorization stays shared (OSQP computes c per problem —
    # here all problems share P, and c only modulates convergence rate).
    Pb0, _, Ab, D, E, c0 = ruiz_equilibrate(
        P, jnp.zeros((n,), dtype), A, st.scaling_iters
    )
    qD = q * D[None, :]
    qnorm = jnp.mean(jnp.max(jnp.abs(qD), axis=1))
    mean_pcol = jnp.mean(jnp.max(jnp.abs(Pb0 / jnp.maximum(c0, 1e-30)), axis=0))
    # Recompute c like OSQP's cost scaling but batch-shared:
    c = 1.0 / _limit_scaling(jnp.maximum(mean_pcol, qnorm))
    Pb = c * (D[:, None] * P * D[None, :])
    qb = c * qD
    lb = l * E[None, :]
    ub = u * E[None, :]

    rho_v = _shared_rho_vec(lb, ub, jnp.asarray(st.rho, dtype), dtype)
    OP = _factor_shared(Pb, Ab, rho_v, sigma, st.method)

    x = jnp.zeros((B, n), dtype) if x0 is None else x0.astype(dtype) / D[None, :]
    y = jnp.zeros((B, m), dtype) if y0 is None else c * y0.astype(dtype) / E[None, :]
    z = jnp.clip(x @ Ab.T, lb, ub)

    def one_iter(carry, _):
        x, z, y, rho_v, OP = carry
        if st.method == "condensed":
            rhs = sigma * x - qb + (rho_v[None, :] * z - y) @ Ab
            xt = rhs @ OP
            zt = xt @ Ab.T
        else:
            rhs = jnp.concatenate([sigma * x - qb, z - y / rho_v[None, :]], axis=1)
            sol = rhs @ OP  # OP symmetric (quasi-definite KKT inverse)
            xt = sol[:, :n]
            zt = z + (sol[:, n:] - y) / rho_v[None, :]
        x_new = alpha * xt + (1 - alpha) * x
        z_relaxed = alpha * zt + (1 - alpha) * z
        z_new = jnp.clip(z_relaxed + y / rho_v[None, :], lb, ub)
        y_new = y + rho_v[None, :] * (z_relaxed - z_new)
        return (x_new, z_new, y_new, rho_v, OP), None

    Einv = 1.0 / E
    Dinv = 1.0 / D

    def residuals(x, z, y):
        Ax = x @ Ab.T
        Px = x @ Pb  # Pb symmetric
        Aty = y @ Ab
        cinv = 1.0 / c
        r_prim = jnp.max(jnp.abs((Ax - z) * Einv[None, :]), axis=1)
        r_dual = cinv * jnp.max(
            jnp.abs((Px + qb + Aty) * Dinv[None, :]), axis=1
        )
        max_prim = jnp.maximum(
            jnp.max(jnp.abs(Ax * Einv[None, :]), axis=1),
            jnp.max(jnp.abs(z * Einv[None, :]), axis=1),
        )
        max_dual = cinv * jnp.maximum(
            jnp.maximum(
                jnp.max(jnp.abs(Aty * Dinv[None, :]), axis=1),
                jnp.max(jnp.abs(Px * Dinv[None, :]), axis=1),
            ),
            jnp.max(jnp.abs(qb * Dinv[None, :]), axis=1),
        )
        eps_pri = st.eps_abs + st.eps_rel * max_prim
        eps_dua = st.eps_abs + st.eps_rel * max_dual
        return r_prim, r_dual, eps_pri, eps_dua, max_prim, max_dual

    def cond_fn(state):
        it, x, z, y, rho_v, OP, all_done, conv, rp, rd = state
        return jnp.logical_and(it < st.max_iter, jnp.logical_not(all_done))

    def body_fn(state):
        it, x, z, y, rho_v, OP, all_done, conv, _, _ = state
        (x, z, y, rho_v, OP), _ = jax.lax.scan(
            one_iter, (x, z, y, rho_v, OP), None, length=st.check_every
        )
        it = it + st.check_every
        r_prim, r_dual, eps_pri, eps_dua, max_prim, max_dual = residuals(x, z, y)
        conv = jnp.logical_and(r_prim <= eps_pri, r_dual <= eps_dua)
        all_done = jnp.all(conv)

        if st.adaptive_rho and m:
            def maybe_adapt(args):
                rho_v, OP = args
                num = jnp.mean(r_prim / jnp.maximum(max_prim, 1e-10))
                den = jnp.mean(r_dual / jnp.maximum(max_dual, 1e-10))
                scale = jnp.sqrt(num / jnp.maximum(den, 1e-10))
                scale = jnp.clip(scale, 1e-3, 1e3)
                trigger = jnp.logical_or(
                    scale > st.adaptive_rho_tolerance,
                    scale < 1.0 / st.adaptive_rho_tolerance,
                )

                def adapt(_):
                    new_rho = jnp.clip(rho_v * scale, _RHO_MIN, _RHO_MAX)
                    return new_rho, _factor_shared(
                        Pb, Ab, new_rho, sigma, st.method
                    )

                return jax.lax.cond(
                    jnp.logical_and(trigger, jnp.logical_not(all_done)),
                    adapt,
                    lambda _: (rho_v, OP),
                    None,
                )

            do_adapt = (it % st.adaptive_rho_interval) < st.check_every
            rho_v, OP = jax.lax.cond(
                do_adapt, maybe_adapt, lambda a: a, (rho_v, OP)
            )
        return (it, x, z, y, rho_v, OP, all_done, conv, r_prim, r_dual)

    it0 = jnp.asarray(0, jnp.int32)
    inf_b = jnp.full((B,), jnp.inf, dtype)
    state = (
        it0,
        x,
        z,
        y,
        rho_v,
        OP,
        jnp.asarray(False),
        jnp.zeros((B,), bool),
        inf_b,
        inf_b,
    )
    it, x, z, y, rho_v, OP, all_done, conv, r_prim, r_dual = jax.lax.while_loop(
        cond_fn, body_fn, state
    )

    return BatchQPSolution(
        x=x * D[None, :],
        y=y * E[None, :] / c,
        z=z * Einv[None, :],
        iters=it,
        converged=conv,
        r_prim=r_prim,
        r_dual=r_dual,
    )
