"""Shared-system batched ADMM — the MXU-saturating fast path.

For LQ/LTI optimal-control problems (quadratic cost, linear dynamics — e.g.
the flagship double-integrator benchmark, BASELINE.json config 1/5) the QP
matrices ``P`` (objective Hessian) and ``A`` (constraint Jacobian) are
INDEPENDENT of the iterate and of the scenario: only the linear term ``q``
and the bounds ``l, u`` differ across scenarios and SQP iterations.

Where the reference solves each scenario's QP separately on the GPU (one OSQP
instance, re-setup per SQP iteration — ``SQPOptimizationSolver.cpp:155-157``),
here ONE factorization (dense inverse of the condensed or quasi-definite KKT
operator) is shared by the entire scenario batch *and* across all SQP
iterations, and every ADMM iteration is two/three real matmuls over the
batch::

    rhs (B,n)  = sigma*x - q + (rho*z - y) @ A          # (B,m)@(m,n) MXU
    xt  (B,n)  = rhs @ OP                               # (B,n)@(n,n) MXU
    zt  (B,m)  = xt @ A^T                               # (B,n)@(n,m) MXU

plus elementwise projection/dual updates (VPU, fused by XLA).  This is the
TPU-first answer to the CUDA backend: no sparse LDL, no per-problem solver
state — just large batched GEMMs.

The API is split prepare/iterate:

* :func:`prepare_shared` — Ruiz equilibration, per-row rho from the
  structural bound types, and the operator factorization.  Done ONCE per
  solve call (the bound *types* — equality/loose/inequality — are fixed by
  the problem structure, so rho is valid for every SQP iteration).
* :func:`admm_iterate_prepared` — the pure iteration loop; this is the only
  thing inside the SQP ``scan``, keeping both the compiled graph small and
  the runtime free of redundant re-factorizations.

Semantics match :mod:`.admm` (OSQP v1.0.0-beta1 as configured by the
reference): Ruiz equilibration, per-row rho with equality scaling, relaxation
alpha, sigma regularization, relative+absolute termination at eps 1e-3
(``SQPOptimizationSolver.cpp:80-85``), adaptive rho (batch-shared, with a
shared re-factorization when triggered — in float32 this is what rescues
problems whose fixed rho stalls the dual residual at the precision floor),
float32.
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

__all__ = [
    "BatchQPSolution",
    "SharedQPFactor",
    "prepare_shared",
    "admm_iterate_prepared",
    "admm_solve_shared",
]


class BatchQPSolution(NamedTuple):
    x: jnp.ndarray  # (B, n)
    y: jnp.ndarray  # (B, m)
    z: jnp.ndarray  # (B, m)
    # scalar int32: iterations until every scenario converged or was
    # certified infeasible/unbounded (whichever stops the shared loop).
    iters: jnp.ndarray
    converged: jnp.ndarray  # (B,) bool
    r_prim: jnp.ndarray  # (B,)
    r_dual: jnp.ndarray  # (B,)
    # Per-scenario OSQP infeasibility certificates (Banjac et al.), same
    # semantics as :class:`.admm.QPSolution`: ``prim_inf[b]`` marks scenario
    # b's QP certified primal infeasible, ``dual_inf[b]`` unbounded.  The
    # whole-batch loop exits early when every scenario is converged OR
    # certified.  Always (B,) bool arrays — every construction site fills
    # them explicitly (false-filled when ``settings.check_infeasibility``
    # is off); no defaults, so a new site that forgot them fails loudly
    # instead of producing scalar fields that break per-scenario indexing.
    prim_inf: jnp.ndarray
    dual_inf: jnp.ndarray


class SharedQPFactor(NamedTuple):
    """Precomputed shared-QP operator (valid while P, A, bound types fixed)."""

    Pb: jnp.ndarray  # (n, n) scaled Hessian
    Ab: jnp.ndarray  # (m, n) scaled constraint matrix
    D: jnp.ndarray  # (n,) variable scaling
    E: jnp.ndarray  # (m,) constraint scaling
    c: jnp.ndarray  # scalar cost scaling
    rho_v: jnp.ndarray  # (m,) per-row rho
    OP: jnp.ndarray  # (n,n) condensed inverse or (n+m,n+m) KKT inverse


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


def _fused_operator(OP, Ab):
    """Block operator for the single-GEMM condensed iteration.

    ``[xt | zt] = [sigma*x - qb | rho*z - y] @ M2`` with
    ``M2 = [[OP, OP A^T], [A OP, A OP A^T]]`` reproduces the 3-GEMM
    iteration's fixed point exactly (``xt = rhs @ OP``, ``zt = xt @ A^T``
    with ``rhs = sigma*x - qb + (rho*z - y) @ A``); see
    ``ADMMSettings.fused_gemm``.
    """
    top = jnp.concatenate([OP, OP @ Ab.T], axis=1)
    AbOP = Ab @ OP
    bottom = jnp.concatenate([AbOP, AbOP @ Ab.T], axis=1)
    return jnp.concatenate([top, bottom], axis=0)


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


def prepare_shared(
    P: jnp.ndarray,  # (n, n) shared Hessian
    A: jnp.ndarray,  # (m, n) shared constraint matrix
    l: jnp.ndarray,  # (B, m) bounds (used for structural row types only)
    u: jnp.ndarray,  # (B, m)
    q_typical: Optional[jnp.ndarray],  # (B, n) representative linear terms
    settings: ADMMSettings,
) -> SharedQPFactor:
    """Equilibrate, choose per-row rho, and factorize — once per solve.

    Matmuls run at ``settings.precision`` (default HIGHEST): the TPU
    default (one bfloat16 MXU pass) floors ADMM residuals above the 1e-3
    termination tolerance — the solve must be genuinely float32 like the
    reference's OSQP build (``OSQP_USE_FLOAT=ON``, cuda_install.sh:44).
    """
    with jax.default_matmul_precision(settings.precision):
        return _prepare_shared_impl(P, A, l, u, q_typical, settings)


def _prepare_shared_impl(P, A, l, u, q_typical, settings):
    dtype = P.dtype
    n = P.shape[0]
    st = settings
    Pb0, _, Ab, D, E, c0 = ruiz_equilibrate(
        P, jnp.zeros((n,), dtype), A, st.scaling_iters
    )
    # Cost scaling from the batch-mean gradient magnitude (OSQP computes c
    # per problem from q; sharing keeps the factorization batch-wide).
    mean_pcol = jnp.mean(jnp.max(jnp.abs(Pb0 / jnp.maximum(c0, 1e-30)), axis=0))
    if q_typical is not None:
        qnorm = jnp.mean(jnp.max(jnp.abs(q_typical * D[None, :]), axis=1))
    else:
        qnorm = jnp.asarray(0.0, dtype)
    c = 1.0 / _limit_scaling(jnp.maximum(mean_pcol, qnorm))
    Pb = c * (D[:, None] * P * D[None, :])
    rho_v = _shared_rho_vec(
        l * E[None, :], u * E[None, :], jnp.asarray(st.rho, dtype), dtype
    )
    OP = _factor_shared(Pb, Ab, rho_v, jnp.asarray(st.sigma, dtype), st.method)
    return SharedQPFactor(Pb=Pb, Ab=Ab, D=D, E=E, c=c, rho_v=rho_v, OP=OP)


def admm_iterate_prepared(
    fac: SharedQPFactor,
    q: jnp.ndarray,  # (B, n)
    l: jnp.ndarray,  # (B, m)
    u: jnp.ndarray,  # (B, m)
    settings: ADMMSettings,
    x0: Optional[jnp.ndarray] = None,  # (B, n) warm start
    y0: Optional[jnp.ndarray] = None,  # (B, m)
) -> BatchQPSolution:
    """Run the ADMM loop against a prepared factorization.

    Pure matmuls + elementwise ops (plus an occasional shared
    re-factorization when adaptive rho triggers); cheap to embed inside the
    SQP ``scan``.  Runs until every scenario meets the OSQP termination
    criteria or ``max_iter``.

    With ``settings.backend == "pallas"`` (condensed method only) the
    iteration loop runs as the fused in-VMEM chunk kernel
    (:mod:`..ops.shared_kernel`): the whole panel batch plus the shared
    operator stay resident on-chip across every iteration, removing the
    per-iteration HBM round trips that bound the XLA loop.  Semantics match
    the XLA path, except that infeasibility certificates are evaluated once
    per rho-constant chunk instead of once per check block (exactly like
    the banded batch path).
    """
    with jax.default_matmul_precision(settings.precision):
        if (
            settings.backend == "pallas"
            and settings.method == "condensed"
            # The fused kernel computes at fixed f32-HIGHEST; honoring a
            # lower requested precision means taking the XLA loop so the
            # two backends cannot silently produce different trajectories.
            and settings.precision == "highest"
            and fac.Ab.shape[0] > 0
        ):
            return _admm_iterate_fused(fac, q, l, u, settings, x0, y0)
        return _admm_iterate_impl(fac, q, l, u, settings, x0, y0)


def _shared_certificates(dx_b, dy_b, Pb, Ab, D, E, cinv, q_orig, l, u, st):
    """Per-scenario OSQP infeasibility certificates on iterate deltas.

    ``dx_b``/``dy_b`` are SCALED deltas (B, n)/(B, m); all tests run on
    unscaled quantities like OSQP's ``auxil.c`` (and admm.py's
    single-problem version).  Matvecs reuse the scaled operators:
    ``A = E^-1 Ab D^-1``, ``P = c^-1 D^-1 Pb D^-1``.
    """
    dtype = dx_b.dtype
    Dinv = 1.0 / D
    Einv = 1.0 / E
    tiny = jnp.asarray(1e-12, dtype)
    dx_u = dx_b * D[None, :]
    dy_u = dy_b * E[None, :] * cinv
    # -- primal infeasibility: delta_y with A^T dy ~ 0 and support
    #    function u'(dy)_+ + l'(dy)_- < 0 (per scenario).
    ndy = jnp.max(jnp.abs(dy_u), axis=1)
    dy_p = jnp.maximum(dy_u, 0.0)
    dy_m = jnp.minimum(dy_u, 0.0)
    # Masked products so inf * 0 cannot produce NaN; an infinite bound
    # with matching delta sign yields +inf, correctly blocking the
    # certificate.
    t_u = jnp.where(dy_p > 0, u * dy_p, 0.0)
    t_l = jnp.where(dy_m < 0, l * dy_m, 0.0)
    support = jnp.sum(t_u + t_l, axis=1)
    # A^T dy_u = c^-1 D^-1 (Ab^T dy_scaled): feed the scaled delta.
    n_Atdy = jnp.max(jnp.abs((dy_b @ Ab) * Dinv[None, :]) * cinv, axis=1)
    pinf = jnp.logical_and(
        ndy > tiny,
        jnp.logical_and(
            support < -st.eps_prim_inf * ndy,
            n_Atdy < st.eps_prim_inf * ndy,
        ),
    )
    # -- dual infeasibility: delta_x with P dx ~ 0, q'dx < 0 and A dx
    #    consistent with a feasible recession direction.
    ndx = jnp.max(jnp.abs(dx_u), axis=1)
    thr = st.eps_dual_inf * ndx
    cond_q = jnp.sum(q_orig * dx_u, axis=1) < -thr
    Pdx = cinv * (dx_b @ Pb) * Dinv[None, :]
    cond_P = jnp.max(jnp.abs(Pdx), axis=1) < thr
    Adx = (dx_b @ Ab.T) * Einv[None, :]
    cond_A = jnp.logical_and(
        jnp.all(jnp.where(u < jnp.inf, Adx < thr[:, None], True), axis=1),
        jnp.all(jnp.where(l > -jnp.inf, Adx > -thr[:, None], True), axis=1),
    )
    dinf = jnp.logical_and(
        ndx > tiny,
        jnp.logical_and(cond_q, jnp.logical_and(cond_P, cond_A)),
    )
    return pinf, dinf


def _admm_iterate_fused(
    fac, q, l, u, settings, x0, y0, batch_tile=None, interpret=None
):
    """Chunked driver around :func:`..ops.shared_kernel.shared_admm_chunk`.

    Division of labor per solve (mirrors ``admm_solve_banded_batch``):

    * iterate (Pallas, batch-leading): iterations up to the next XLA-rule
      adaptation boundary per kernel entry (a dynamic bound, clamped to
      the remaining ``max_iter`` budget), OSQP termination every
      ``check_every``, batch-shared (nobody freezes — the XLA path's
      semantics);
    * between chunks (XLA): infeasibility certificates on chunk deltas and
      OSQP adaptive rho with a shared re-factorization.
    """
    from ..ops.shared_kernel import pick_shared_tile, shared_admm_chunk

    dtype = fac.Pb.dtype
    st = settings
    B, n = q.shape
    m = fac.Ab.shape[0]
    Pb, Ab, D, E, c, rho_v0, OP0 = fac
    sigma = jnp.asarray(st.sigma, dtype)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if batch_tile is None:
        batch_tile = pick_shared_tile(B, n, m)
    if batch_tile is None:
        # Working set does not fit in VMEM at any tile: XLA loop.
        return _admm_iterate_impl(fac, q, l, u, st, x0, y0)

    l = jnp.minimum(l.astype(dtype), u.astype(dtype))
    u = u.astype(dtype)
    q_orig = q.astype(dtype)
    qb = c * q_orig * D[None, :]
    lb = l * E[None, :]
    ub = u * E[None, :]
    x = jnp.zeros((B, n), dtype) if x0 is None else x0.astype(dtype) / D[None, :]
    y = jnp.zeros((B, m), dtype) if y0 is None else c * y0.astype(dtype) / E[None, :]
    z = jnp.clip(x @ Ab.T, lb, ub)

    pad_b = (-B) % batch_tile
    valid = jnp.arange(B + pad_b) < B
    if pad_b:
        rep = lambda a: jnp.concatenate(
            [a, jnp.broadcast_to(a[:1], (pad_b,) + a.shape[1:])], axis=0
        )
        qb, lb, ub, x, y, z = map(rep, (qb, lb, ub, x, y, z))
        q_orig = rep(q_orig)
        l, u = rep(l), rep(u)
    Bp = B + pad_b

    ce = st.check_every
    if st.adaptive_rho:
        ari = st.adaptive_rho_interval

        def chunk_bound(it):
            # Next adaptation boundary under the XLA rule: the XLA loop
            # adapts at the end of the first check block (a multiple of
            # check_every) t > it with t % ari < check_every.  Ending each
            # kernel chunk exactly there keeps the rho trajectory identical
            # to the XLA path for ANY (ari, check_every) pair, including
            # non-divisible ones.
            k = it // ari + 1
            t_next = -(-(k * ari) // ce) * ce
            return jnp.minimum(t_next, st.max_iter) - it

    else:

        def chunk_bound(it):
            return st.max_iter - it

    Dinv = 1.0 / D
    Einv = 1.0 / E
    cinv = 1.0 / c
    false_b = jnp.zeros((Bp,), bool)
    inf_b = jnp.full((Bp,), jnp.inf, dtype)
    state = (
        jnp.asarray(0, jnp.int32),
        x, z, y, rho_v0, OP0,
        false_b,  # conv
        false_b,  # pinf
        false_b,  # dinf
        inf_b,  # rp
        inf_b,  # rd
    )

    def cond_fn(s):
        it, _, _, _, _, _, conv, pinf, dinf = s[:9]
        done = conv | pinf | dinf
        return jnp.logical_and(it < st.max_iter, ~jnp.all(done))

    def body_fn(s):
        it, x, z, y, rho, OP, conv, pinf, dinf, rp, rd = s
        done_in = conv | pinf | dinf
        (x2, z2, y2, conv_k, it_inc, rp_k, rd_k, rpr_k, rdr_k) = (
            shared_admm_chunk(
                done_in, chunk_bound(it),
                OP, Ab, Pb, rho, lb, ub, qb, Dinv, Einv, cinv,
                x, z, y,
                check_every=st.check_every,
                sigma=float(st.sigma),
                alpha=float(st.alpha),
                eps_abs=float(st.eps_abs),
                eps_rel=float(st.eps_rel),
                batch_tile=batch_tile,
                interpret=interpret,
                iter_precision=st.iter_precision,
            )
        )
        ran = it_inc > 0
        conv = jnp.where(ran, conv_k, conv)
        rp = jnp.where(ran, rp_k, rp)
        rd = jnp.where(ran, rd_k, rd)
        if st.check_infeasibility:
            pinf_k, dinf_k = _shared_certificates(
                x2 - x, y2 - y, Pb, Ab, D, E, cinv, q_orig, l, u, st
            )
            pinf = pinf | (pinf_k & ran & ~conv)
            dinf = dinf | (dinf_k & ran & ~conv)
        x, z, y = x2, z2, y2
        it = it + jnp.max(it_inc)
        if st.adaptive_rho:
            # Batch-shared OSQP rho adaptation from the kernel's relative
            # residuals, aggregated over still-active real scenarios only
            # (padded replicas and converged/certified scenarios excluded —
            # see _admm_iterate_impl for the rationale).
            act = (~(conv | pinf | dinf) & valid & ran).astype(dtype)
            cnt = jnp.maximum(jnp.sum(act), 1.0)
            # Mask BEFORE the product: a tile that was all-done at entry
            # reports inf residuals, and inf * 0.0 = NaN would poison the
            # sum (silently disabling rho adaptation for every later chunk).
            rpr_sum = jnp.sum(jnp.where(act > 0, rpr_k, 0.0))
            rdr_sum = jnp.sum(jnp.where(act > 0, rdr_k, 0.0))
            scale = jnp.sqrt(
                (rpr_sum / cnt) / jnp.maximum(rdr_sum / cnt, 1e-12)
            )
            scale = jnp.clip(scale, 1e-3, 1e3)
            trigger = jnp.logical_or(
                scale > st.adaptive_rho_tolerance,
                scale < 1.0 / st.adaptive_rho_tolerance,
            ) & jnp.any(act > 0)

            def adapt(_):
                new_rho = jnp.clip(rho * scale, _RHO_MIN, _RHO_MAX)
                return new_rho, _factor_shared(
                    Pb, Ab, new_rho, sigma, st.method
                )

            rho, OP = jax.lax.cond(
                trigger, adapt, lambda _: (rho, OP), None
            )
        return (it, x, z, y, rho, OP, conv, pinf, dinf, rp, rd)

    (it, x, z, y, _, _, conv, pinf, dinf, rp, rd) = jax.lax.while_loop(
        cond_fn, body_fn, state
    )
    return BatchQPSolution(
        x=(x * D[None, :])[:B],
        y=(y * E[None, :] * cinv)[:B],
        z=(z * Einv[None, :])[:B],
        iters=it,
        converged=conv[:B],
        r_prim=rp[:B],
        r_dual=rd[:B],
        prim_inf=pinf[:B],
        dual_inf=dinf[:B],
    )


def _admm_iterate_impl(fac, q, l, u, settings, x0, y0):
    dtype = fac.Pb.dtype
    st = settings
    B, n = q.shape
    m = fac.Ab.shape[0]
    sigma = jnp.asarray(st.sigma, dtype)
    alpha = jnp.asarray(st.alpha, dtype)
    Pb, Ab, D, E, c, rho_v0, OP0 = fac
    fused = st.fused_gemm and st.method == "condensed" and m > 0
    if fused:
        # The loop carries the (n+m, n+m) block operator instead of OP;
        # a rho adaptation refactors OP and rebuilds it (rare).
        OP0 = _fused_operator(OP0, Ab)

    l = jnp.minimum(l.astype(dtype), u.astype(dtype))
    u = u.astype(dtype)
    q_orig = q.astype(dtype)  # unscaled, for infeasibility certificates
    qb = c * q_orig * D[None, :]
    lb = l * E[None, :]
    ub = u * E[None, :]

    x = jnp.zeros((B, n), dtype) if x0 is None else x0.astype(dtype) / D[None, :]
    y = jnp.zeros((B, m), dtype) if y0 is None else c * y0.astype(dtype) / E[None, :]
    z = jnp.clip(x @ Ab.T, lb, ub)

    # Iteration-GEMM precision override (ADMMSettings.iter_precision): the
    # residual matvecs and certificates stay on the ambient
    # ``settings.precision`` context, so termination still certifies
    # full-precision residuals (same contract as the Pallas kernel).
    _px = (
        jax.lax.Precision.HIGHEST
        if st.iter_precision == "highest"
        else jax.lax.Precision.HIGH
    )
    _pz = (
        jax.lax.Precision.HIGH
        if st.iter_precision == "high"
        else jax.lax.Precision.HIGHEST
    )

    def one_iter(carry, _):
        x, z, y, rho, OP = carry
        if fused:
            # One (B, n+m) @ (n+m, n+m) GEMM per iteration (see
            # ADMMSettings.fused_gemm); OP here is the block operator.
            lhs = jnp.concatenate(
                [sigma * x - qb, rho[None, :] * z - y], axis=1
            )
            xtzt = jnp.matmul(lhs, OP, precision=_px)
            xt = xtzt[:, :n]
            zt = xtzt[:, n:]
        elif st.method == "condensed":
            rhs = sigma * x - qb + jnp.matmul(
                rho[None, :] * z - y, Ab, precision=_px
            )
            xt = jnp.matmul(rhs, OP, precision=_px)
            zt = jnp.matmul(xt, Ab.T, precision=_pz)
        else:
            rhs = jnp.concatenate([sigma * x - qb, z - y / rho[None, :]], axis=1)
            sol = rhs @ OP  # OP symmetric (quasi-definite KKT inverse)
            xt = sol[:, :n]
            zt = z + (sol[:, n:] - y) / rho[None, :]
        x_new = alpha * xt + (1 - alpha) * x
        z_relaxed = alpha * zt + (1 - alpha) * z
        z_new = jnp.clip(z_relaxed + y / rho[None, :], lb, ub)
        y_new = y + rho[None, :] * (z_relaxed - z_new)
        return (x_new, z_new, y_new, rho, OP), None

    Einv = 1.0 / E
    Dinv = 1.0 / D
    cinv = 1.0 / c

    def residuals(x, z, y):
        Ax = x @ Ab.T
        Px = x @ Pb  # Pb symmetric
        Aty = y @ Ab
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
        rp_rel = r_prim / jnp.maximum(max_prim, 1e-12)
        rd_rel = r_dual / jnp.maximum(max_dual, 1e-12)
        return r_prim, r_dual, eps_pri, eps_dua, rp_rel, rd_rel

    def cond_fn(state):
        it, x, z, y, rho, OP, all_done, conv, pinf, dinf, rp, rd = state
        return jnp.logical_and(it < st.max_iter, jnp.logical_not(all_done))

    def body_fn(state):
        it, x, z, y, rho, OP, all_done, conv, pinf, dinf, _, _ = state
        x_old, y_old = x, y
        (x, z, y, rho, OP), _ = jax.lax.scan(
            one_iter, (x, z, y, rho, OP), None, length=st.check_every
        )
        it = it + st.check_every
        r_prim, r_dual, eps_pri, eps_dua, rp_rel, rd_rel = residuals(x, z, y)
        conv = jnp.logical_and(r_prim <= eps_pri, r_dual <= eps_dua)
        if st.check_infeasibility:
            pinf_new, dinf_new = _shared_certificates(
                x - x_old, y - y_old, Pb, Ab, D, E, cinv, q_orig, l, u, st
            )
            # Sticky: once a scenario is certified it stays certified (the
            # batch keeps iterating, so later check blocks could otherwise
            # drop a certificate when the deltas change under rho adaptation).
            pinf = jnp.logical_or(
                pinf, jnp.logical_and(pinf_new, jnp.logical_not(conv))
            )
            dinf = jnp.logical_or(
                dinf, jnp.logical_and(dinf_new, jnp.logical_not(conv))
            )
        # Early exit when every scenario is converged OR certified
        # infeasible/unbounded (certified scenarios would otherwise diverge
        # and hold the whole batch at max_iter).
        all_done = jnp.all(jnp.logical_or(conv, jnp.logical_or(pinf, dinf)))

        if st.adaptive_rho and m:
            # OSQP rho adaptation, batch-shared: rho *= sqrt(rel primal res
            # / rel dual res), with a shared re-factorization when
            # triggered.  In float32 this is what rescues problems whose
            # fixed rho stalls the dual residual at the precision floor.
            def maybe_adapt(args):
                rho, OP = args
                # Aggregate only over still-active scenarios: a certified
                # infeasible/unbounded scenario's residuals diverge and would
                # otherwise poison the batch-shared rho for everyone else.
                # Converged scenarios are excluded too, deliberately — their
                # residuals sit at the tolerance floor and would drag the
                # aggregate toward 1, stalling adaptation for the scenarios
                # still working (this changes rho trajectories for mixed
                # feasible batches vs a mean-over-all rule, by design).
                act = jnp.logical_not(
                    jnp.logical_or(conv, jnp.logical_or(pinf, dinf))
                ).astype(dtype)
                cnt = jnp.maximum(jnp.sum(act), 1.0)
                scale = jnp.sqrt(
                    (jnp.sum(rp_rel * act) / cnt)
                    / jnp.maximum(jnp.sum(rd_rel * act) / cnt, 1e-12)
                )
                scale = jnp.clip(scale, 1e-3, 1e3)
                trigger = jnp.logical_or(
                    scale > st.adaptive_rho_tolerance,
                    scale < 1.0 / st.adaptive_rho_tolerance,
                )

                def adapt(_):
                    new_rho = jnp.clip(rho * scale, _RHO_MIN, _RHO_MAX)
                    new_OP = _factor_shared(Pb, Ab, new_rho, sigma, st.method)
                    if fused:
                        new_OP = _fused_operator(new_OP, Ab)
                    return new_rho, new_OP

                return jax.lax.cond(
                    jnp.logical_and(trigger, jnp.logical_not(all_done)),
                    adapt,
                    lambda _: (rho, OP),
                    None,
                )

            do_adapt = (it % st.adaptive_rho_interval) < st.check_every
            rho, OP = jax.lax.cond(
                do_adapt, maybe_adapt, lambda a: a, (rho, OP)
            )

        return (it, x, z, y, rho, OP, all_done, conv, pinf, dinf, r_prim, r_dual)

    inf_b = jnp.full((B,), jnp.inf, dtype)
    false_b = jnp.zeros((B,), bool)
    state = (
        jnp.asarray(0, jnp.int32),
        x,
        z,
        y,
        rho_v0,
        OP0,
        jnp.asarray(False),
        false_b,
        false_b,
        false_b,
        inf_b,
        inf_b,
    )
    it, x, z, y, rho_f, OP_f, all_done, conv, pinf, dinf, r_prim, r_dual = (
        jax.lax.while_loop(cond_fn, body_fn, state)
    )

    return BatchQPSolution(
        x=x * D[None, :],
        y=y * E[None, :] / c,
        z=z * Einv[None, :],
        iters=it,
        converged=conv,
        r_prim=r_prim,
        r_dual=r_dual,
        prim_inf=pinf,
        dual_inf=dinf,
    )


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
    """One-shot convenience wrapper: prepare + iterate."""
    fac = prepare_shared(P, A, l, u, q, settings)
    return admm_iterate_prepared(fac, q, l, u, settings, x0=x0, y0=y0)
