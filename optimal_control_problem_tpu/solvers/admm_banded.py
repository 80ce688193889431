"""Banded (block-tridiagonal) ADMM for stage-structured OCP QPs.

The condensed ADMM operator of a stage-structured problem is
block-tridiagonal (stagewise.py): the Hessian is block-diagonal per frame,
the constraint stack ``A = [I; J_dyn; J_sc]`` has identity rows, dynamics
rows coupling frames (k, k+1), and per-stage rows — so

    M = P + sigma I + A^T R A

has diagonal blocks ``H_k + sigma I + diag(rho_x_k) + J0_k^T R_k J0_k +
J1_{k-1}^T R_{k-1} J1_{k-1} + Jc_k^T Rc_k Jc_k`` and subdiagonal blocks
``J1_k^T R_k J0_k``.

This module never materializes the dense ``(n, n)`` operator or the dense
``(m, n)`` constraint matrix: the factorization is the block LDL^T of
``ops/block_tridiag.py`` (O(N w^3) instead of O(N^3 w^3)) and every
matrix-vector product is computed from the stage blocks (O(N w^2)).  That
is what makes long horizons (quadrotor h100: n=1600, dense operator
10 MB/scenario) tractable per-scenario — the OCP analog of exploiting
sequence structure instead of dense attention (SURVEY.md section 5,
"long-context").

Semantics: OSQP iteration identical to :mod:`.admm`, including modified
Ruiz equilibration — computed structurally on the stage blocks (column and
row inf-norms of [P A^T; A 0] assembled from block contributions), so the
dense KKT matrix is never formed even for scaling.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops.block_tridiag import btd_factor, btd_solve, cr_factor, cr_solve
from .admm import (
    ADMMSettings,
    _RHO_EQ_OVER_RHO_INEQ,
    _RHO_MAX,
    _RHO_MIN,
    _RHO_TOL,
    _limit_scaling,
    f32_matmuls,
)

__all__ = [
    "BandedQP",
    "admm_solve_banded",
    "ruiz_equilibrate_banded",
    "banded_residuals",
    "banded_certificates",
    "banded_polish",
]


class BandedQP(NamedTuple):
    """Stage-block description of one QP (leading dims vmappable).

    ``Hb``: (N, w, w) regularized Hessian blocks;
    ``J0``/``J1``: (N-1, r, w) dynamics Jacobians wrt frame k / k+1
    (``r = 0`` -> pass shape (N-1, 0, w));
    ``Jc``: (N, r2, w) stage-constraint Jacobians (``r2 = 0`` allowed);
    ``q``: (N*w,) linear term;
    ``l``/``u``: bounds over rows ordered [x (N*w); dyn ((N-1)*r); sc (N*r2)].
    """

    Hb: jnp.ndarray
    J0: jnp.ndarray
    J1: jnp.ndarray
    Jc: jnp.ndarray
    q: jnp.ndarray
    l: jnp.ndarray
    u: jnp.ndarray


def _rho_vec(l, u, rho, dtype):
    loose = jnp.logical_and(l <= -jnp.inf, u >= jnp.inf)
    eq = (u - l) < _RHO_TOL
    rho_v = jnp.full(l.shape, rho, dtype)
    rho_v = jnp.where(
        eq, jnp.clip(rho * _RHO_EQ_OVER_RHO_INEQ, _RHO_MIN, _RHO_MAX), rho_v
    )
    rho_v = jnp.where(loose, _RHO_MIN, rho_v)
    return rho_v


def ruiz_equilibrate_banded(qp: BandedQP, iters: int):
    """Modified Ruiz equilibration computed structurally on stage blocks.

    Mirrors :func:`.admm.ruiz_equilibrate` (OSQP ``scale.c``), but every
    column/row inf-norm of ``[[P, A^T], [A, 0]]`` is assembled from the
    block-tridiagonal contributions — the dense KKT matrix is never formed.
    Returns ``(scaled_qp, D, E, c)``: ``D`` the (N*w,) variable scaling,
    ``E`` the (m,) row scaling ordered [x; dyn; sc], ``c`` the cost scaling,
    such that ``Hb_s = c D Hb D``, ``A_s = E A D``, ``q_s = c D q``,
    ``l_s/u_s = E l / E u``.
    """
    N, w = qp.Hb.shape[0], qp.Hb.shape[1]
    r = qp.J0.shape[1]
    r2 = qp.Jc.shape[1]
    dtype = qp.Hb.dtype

    def scaled_blocks(D, Ex, Ed, Ec, c):
        # D/Ex: (N, w); Ed: (N-1, r); Ec: (N, r2).
        Pb = c * D[:, :, None] * qp.Hb * D[:, None, :]
        Ax = Ex * D  # identity rows of A are diagonal: value per (k, j)
        Ad0 = Ed[:, :, None] * qp.J0 * D[:-1, None, :] if r else qp.J0
        Ad1 = Ed[:, :, None] * qp.J1 * D[1:, None, :] if r else qp.J1
        Ac = Ec[:, :, None] * qp.Jc * D[:, None, :] if r2 else qp.Jc
        return Pb, Ax, Ad0, Ad1, Ac

    def body(_, carry):
        D, Ex, Ed, Ec, c = carry
        Pb, Ax, Ad0, Ad1, Ac = scaled_blocks(D, Ex, Ed, Ec, c)
        # Column inf-norms of [Pb; Ab] per variable (k, j).  Variable (k, j)
        # is touched by P block k, its identity row, dynamics rows k (J0)
        # and k-1 (J1), and stage-constraint rows k.
        norm_x = jnp.max(jnp.abs(Pb), axis=1)
        norm_x = jnp.maximum(norm_x, jnp.abs(Ax))
        if r:
            norm_x = norm_x.at[:-1].max(jnp.max(jnp.abs(Ad0), axis=1))
            norm_x = norm_x.at[1:].max(jnp.max(jnp.abs(Ad1), axis=1))
        if r2:
            norm_x = jnp.maximum(norm_x, jnp.max(jnp.abs(Ac), axis=1))
        D = D / jnp.sqrt(_limit_scaling(norm_x))
        # Row inf-norms of Ab (same pre-update blocks, as in the dense path).
        Ex = Ex / jnp.sqrt(_limit_scaling(jnp.abs(Ax)))
        if r:
            nrow = jnp.maximum(
                jnp.max(jnp.abs(Ad0), axis=2), jnp.max(jnp.abs(Ad1), axis=2)
            )
            Ed = Ed / jnp.sqrt(_limit_scaling(nrow))
        if r2:
            Ec = Ec / jnp.sqrt(_limit_scaling(jnp.max(jnp.abs(Ac), axis=2)))
        # Cost scaling: gamma = 1/max(mean P col-norm, ||qb||_inf).
        Pb = c * D[:, :, None] * qp.Hb * D[:, None, :]
        qb = c * (D.reshape(-1) * qp.q)
        mean_pcol = jnp.mean(jnp.max(jnp.abs(Pb), axis=1))
        gamma = 1.0 / _limit_scaling(
            jnp.maximum(mean_pcol, jnp.max(jnp.abs(qb)))
        )
        return D, Ex, Ed, Ec, c * gamma

    D = jnp.ones((N, w), dtype)
    Ex = jnp.ones((N, w), dtype)
    Ed = jnp.ones((max(N - 1, 0), r), dtype)
    Ec = jnp.ones((N, r2), dtype)
    c = jnp.asarray(1.0, dtype)
    if iters > 0:
        D, Ex, Ed, Ec, c = jax.lax.fori_loop(
            0, iters, body, (D, Ex, Ed, Ec, c)
        )
    # Pin the identity-row scaling to its equilibration fixed point
    # EXACTLY: every solver below hardcodes the scaled x-section of A as
    # the identity (``_apply_A`` returns x, the kernels' ``mat_A`` pass x
    # through), which is only correct when Ex * D == 1.  The Ruiz loop
    # drives the product to 1 but lands ~5e-4 away after 10 iterations —
    # an offset that would floor box-bound enforcement accuracy below the
    # QP tolerance regardless of eps.
    Ex = 1.0 / D

    E_parts = [Ex.reshape(-1)]
    if r:
        E_parts.append(Ed.reshape(-1))
    if r2:
        E_parts.append(Ec.reshape(-1))
    E = jnp.concatenate(E_parts)
    scaled = BandedQP(
        Hb=c * D[:, :, None] * qp.Hb * D[:, None, :],
        J0=Ed[:, :, None] * qp.J0 * D[:-1, None, :] if r else qp.J0,
        J1=Ed[:, :, None] * qp.J1 * D[1:, None, :] if r else qp.J1,
        Jc=Ec[:, :, None] * qp.Jc * D[:, None, :] if r2 else qp.Jc,
        q=c * D.reshape(-1) * qp.q,
        l=E * qp.l,
        u=E * qp.u,
    )
    return scaled, D.reshape(-1), E, c


def apply_scalings(qp: BandedQP, D, E, c):
    """Scale a BandedQP with PRECOMPUTED Ruiz factors (one elementwise
    pass — the cheap reuse path behind ``ADMMSettings.scaling_refresh ==
    "tick"``).  ``D (n,)``, ``E (m,)`` ordered [x; dyn; sc], ``c`` scalar;
    same output contract as :func:`ruiz_equilibrate_banded`.
    """
    N, w = qp.Hb.shape[0], qp.Hb.shape[1]
    r = qp.J0.shape[1]
    r2 = qp.Jc.shape[1]
    n = N * w
    Dn = D.reshape(N, w)
    Ed = E[n : n + (N - 1) * r].reshape(N - 1, r) if r else None
    Ec = E[n + (N - 1) * r :].reshape(N, r2) if r2 else None
    return BandedQP(
        Hb=c * Dn[:, :, None] * qp.Hb * Dn[:, None, :],
        J0=Ed[:, :, None] * qp.J0 * Dn[:-1, None, :] if r else qp.J0,
        J1=Ed[:, :, None] * qp.J1 * Dn[1:, None, :] if r else qp.J1,
        Jc=Ec[:, :, None] * qp.Jc * Dn[:, None, :] if r2 else qp.Jc,
        q=c * D * qp.q,
        l=E * qp.l,
        u=E * qp.u,
    )


def _apply_A(qp: BandedQP, x):
    """A @ x from stage blocks.  x: (N, w) -> rows [x; dyn; sc] flattened.

    Broadcast-multiply-reduce rather than einsum/dot: at block widths
    w <= 16 there is nothing for the MXU here, and — crucially — this is
    the EXACT op sequence the fused Pallas chunk uses (ops/banded_kernel.py
    ``mat_A``), so the batch-native driver's convergence decisions bit-match
    this reference path (a dot would accumulate with FMAs and drift in the
    last ulp over hundreds of ADMM iterations).
    """
    parts = [x.reshape(-1)]
    if qp.J0.shape[1]:
        ax_d = jnp.sum(qp.J0 * x[:-1][:, None, :], axis=2) + jnp.sum(
            qp.J1 * x[1:][:, None, :], axis=2
        )
        parts.append(ax_d.reshape(-1))
    if qp.Jc.shape[1]:
        parts.append(jnp.sum(qp.Jc * x[:, None, :], axis=2).reshape(-1))
    return jnp.concatenate(parts)


def _apply_AT(qp: BandedQP, t):
    """A^T @ t from stage blocks.  t: (m,) -> (N, w).

    Multiply-reduce in the kernel's op order (see :func:`_apply_A`).
    """
    N, w = qp.Hb.shape[0], qp.Hb.shape[1]
    r = qp.J0.shape[1]
    r2 = qp.Jc.shape[1]
    n = N * w
    out = t[:n].reshape(N, w)
    if r:
        td = t[n : n + (N - 1) * r].reshape(N - 1, r)
        out = out.at[:-1].add(jnp.sum(qp.J0 * td[:, :, None], axis=1))
        out = out.at[1:].add(jnp.sum(qp.J1 * td[:, :, None], axis=1))
    if r2:
        tc = t[n + (N - 1) * r :].reshape(N, r2)
        out = out + jnp.sum(qp.Jc * tc[:, :, None], axis=1)
    return out


def _apply_P(qp: BandedQP, x):
    """P @ x (block-diagonal Hessian).  x: (N, w) -> (N, w).

    Multiply-reduce in the kernel's op order (see :func:`_apply_A`).
    """
    return jnp.sum(qp.Hb * x[:, None, :], axis=2)


def _build_M_blocks(qp: BandedQP, rho_v, sigma):
    """Diagonal/subdiagonal blocks of M = P + sigma I + A^T R A.

    Contractions over the (tiny, static) residual dims are explicit
    Python loops of broadcast-multiply-adds — the exact accumulation
    order of the fused chunk kernel's in-kernel M assembly
    (ops/banded_kernel.py prologue), preserving the bit-match between
    the per-scenario XLA path and the batch-native kernel path.
    """
    N, w = qp.Hb.shape[0], qp.Hb.shape[1]
    r = qp.J0.shape[1]
    r2 = qp.Jc.shape[1]
    n = N * w
    dtype = qp.Hb.dtype
    rho_x = rho_v[:n].reshape(N, w)
    eye_w = jnp.eye(w, dtype=dtype)
    diag = qp.Hb + sigma * eye_w[None] + eye_w[None] * rho_x[:, :, None]

    def outer_r(rho_s, ja, jb):
        """sum_r rho[k,r] * ja[k,r,a] * jb[k,r,b] -> (k, w, w).

        Sequential slice-based accumulation — the exact association order
        of the fused chunk kernel's in-kernel M assembly (a reduction op's
        order differs between layouts; a fixed add chain does not)."""
        acc = None
        for i in range(ja.shape[1]):
            t = (
                rho_s[:, i : i + 1, None, None] * ja[:, i : i + 1, :, None]
            ) * jb[:, i : i + 1, None, :]
            acc = t if acc is None else acc + t
        return acc.reshape(ja.shape[0], w, w)

    if r:
        rho_d = rho_v[n : n + (N - 1) * r].reshape(N - 1, r)
        diag = diag.at[:-1].add(outer_r(rho_d, qp.J0, qp.J0))
        diag = diag.at[1:].add(outer_r(rho_d, qp.J1, qp.J1))
        lower = outer_r(rho_d, qp.J1, qp.J0)
    else:
        lower = jnp.zeros((N - 1, w, w), dtype)
    if r2:
        rho_c = rho_v[n + (N - 1) * r :].reshape(N, r2)
        diag = diag + outer_r(rho_c, qp.Jc, qp.Jc)
    return diag, lower


def banded_residuals(qp: BandedQP, x, z, y, Einv, Dinv, cinv, st: ADMMSettings):
    """OSQP unscaled residuals/tolerances from stage blocks.

    ``x``: (n,) scaled iterate; ``z``/``y``: (m,) scaled; ``Einv``/``Dinv``:
    row/variable inverse scalings; ``cinv``: inverse cost scaling.  Returns
    ``(r_prim, r_dual, eps_pri, eps_dua, rp_rel, rd_rel)``.  Shared by the
    per-scenario XLA loop and the batch-native chunk driver.
    """
    N, w = qp.Hb.shape[0], qp.Hb.shape[1]
    Ax = _apply_A(qp, x.reshape(N, w))
    Px = _apply_P(qp, x.reshape(N, w)).reshape(-1)
    Aty = _apply_AT(qp, y).reshape(-1)
    q = qp.q
    r_prim = jnp.max(jnp.abs((Ax - z) * Einv))
    r_dual = cinv * jnp.max(jnp.abs((Px + q + Aty) * Dinv))
    max_prim = jnp.maximum(
        jnp.max(jnp.abs(Ax * Einv)), jnp.max(jnp.abs(z * Einv))
    )
    max_dual = cinv * jnp.maximum(
        jnp.maximum(jnp.max(jnp.abs(Aty * Dinv)), jnp.max(jnp.abs(Px * Dinv))),
        jnp.max(jnp.abs(q * Dinv)),
    )
    eps_pri = st.eps_abs + st.eps_rel * max_prim
    eps_dua = st.eps_abs + st.eps_rel * max_dual
    rp_rel = r_prim / jnp.maximum(max_prim, 1e-12)
    rd_rel = r_dual / jnp.maximum(max_dual, 1e-12)
    return r_prim, r_dual, eps_pri, eps_dua, rp_rel, rd_rel


def banded_certificates(qp: BandedQP, dx_s, dy_s, D, E, cinv, st: ADMMSettings):
    """OSQP delta-iterate infeasibility certificates on UNSCALED quantities.

    ``dx_s``/``dy_s`` are scaled iterate deltas over one check block.  With
    A_s = E A D, P_s = c D P D, q_s = c D q and the structural matvecs
    operating on the scaled blocks:

        dy_u       = E dy_s / c            (unscaled dual delta)
        A^T dy_u   = (1/c) D^{-1} A_s^T dy_s
        dx_u       = D dx_s
        P dx_u     = (1/c) D^{-1} P_s dx_s
        q . dx_u   = (1/c) q_s . dx_s
        A dx_u     = E^{-1} A_s dx_s

    Mirrors the dense version in ``.admm._admm_solve_impl``.
    """
    N, w = qp.Hb.shape[0], qp.Hb.shape[1]
    dtype = qp.Hb.dtype
    l, u, q = qp.l, qp.u, qp.q
    Dinv, Einv = 1.0 / D, 1.0 / E
    tiny = jnp.asarray(1e-12, dtype)
    # -- primal infeasibility via dy.
    dy_u = E * dy_s * cinv
    ndy = jnp.max(jnp.abs(dy_u))
    lu, uu = l * Einv, u * Einv  # original bounds
    dy_p = jnp.maximum(dy_u, 0.0)
    dy_m = jnp.minimum(dy_u, 0.0)
    support = jnp.sum(
        jnp.where(dy_p > 0, uu * dy_p, 0.0)
        + jnp.where(dy_m < 0, lu * dy_m, 0.0)
    )
    n_Atdy = cinv * jnp.max(jnp.abs(Dinv * _apply_AT(qp, dy_s).reshape(-1)))
    prim_inf = jnp.logical_and(
        ndy > tiny,
        jnp.logical_and(
            support < -st.eps_prim_inf * ndy,
            n_Atdy < st.eps_prim_inf * ndy,
        ),
    )
    # -- dual infeasibility via dx.
    dx_u = D * dx_s
    ndx = jnp.max(jnp.abs(dx_u))
    thr = st.eps_dual_inf * ndx
    cond_q = cinv * (q @ dx_s) < -thr
    cond_P = (
        cinv
        * jnp.max(jnp.abs(Dinv * _apply_P(qp, dx_s.reshape(N, w)).reshape(-1)))
        < thr
    )
    Adx = Einv * _apply_A(qp, dx_s.reshape(N, w))
    cond_A = jnp.logical_and(
        jnp.all(jnp.where(uu < jnp.inf, Adx < thr, True)),
        jnp.all(jnp.where(lu > -jnp.inf, Adx > -thr, True)),
    )
    dual_inf = jnp.logical_and(
        ndx > tiny,
        jnp.logical_and(cond_q, jnp.logical_and(cond_P, cond_A)),
    )
    return prim_inf, dual_inf


def banded_polish(
    qp: BandedQP,
    st: ADMMSettings,
    factor,
    solve,
    x,
    y,
    z,
    r_prim,
    r_dual,
    Einv,
    Dinv,
    cinv,
):
    """Active-set polish with block structure (the OSQP ``polish.c`` analog
    of the dense solver's masked-KKT re-solve): rows whose dual sits on a
    bound with matching sign are pinned via a 1/delta penalty in the SAME
    block-tridiagonal operator family, and two augmented-Lagrangian sweeps
    remove the O(delta) bias (constraint violation falls to O(delta^2)).
    Accepted only if both unscaled residuals improve.  All quantities are
    in SCALED space; returns updated ``(x, y, z, r_prim, r_dual)``.
    """
    N, w = qp.Hb.shape[0], qp.Hb.shape[1]
    m = qp.l.shape[0]
    dtype = qp.Hb.dtype
    l, u, q = qp.l, qp.u, qp.q
    delta = jnp.asarray(st.polish_delta, dtype)
    lower_act = y < 0.0
    upper_act = y > 0.0
    active = jnp.logical_or(lower_act, upper_act)
    b_act = jnp.where(upper_act, u, jnp.where(lower_act, l, 0.0))
    rho_pol = jnp.where(active, 1.0 / delta, jnp.asarray(0.0, dtype))
    diag_p, lower_p = _build_M_blocks(qp, rho_pol, delta)
    fac_p = factor(diag_p, lower_p)

    def al_sweep(carry, _):
        nu, _xp = carry
        rhs = -q + _apply_AT(qp, (rho_pol * b_act - nu)).reshape(-1)
        x_p = solve(fac_p, rhs.reshape(N, w)).reshape(-1)
        Axp = _apply_A(qp, x_p.reshape(N, w))
        nu = nu + jnp.where(active, rho_pol * (Axp - b_act), 0.0)
        return (nu, x_p), None

    (nu, x_p), _ = jax.lax.scan(
        al_sweep, (jnp.zeros((m,), dtype), x), None, length=2
    )
    y_p = jnp.where(active, nu, 0.0)
    z_p = jnp.clip(_apply_A(qp, x_p.reshape(N, w)), l, u)
    rp_p, rd_p, _, _, _, _ = banded_residuals(
        qp, x_p, z_p, y_p, Einv, Dinv, cinv, st
    )
    better = jnp.logical_and(rp_p <= r_prim, rd_p <= r_dual)
    pick = lambda a, b: jnp.where(better, a, b)
    x, y, z = pick(x_p, x), pick(y_p, y), pick(z_p, z)
    r_prim, r_dual = pick(rp_p, r_prim), pick(rd_p, r_dual)
    return x, y, z, r_prim, r_dual


@partial(jax.jit, static_argnames=("settings",))
@f32_matmuls
def admm_solve_banded(
    qp: BandedQP,
    settings: ADMMSettings = ADMMSettings(),
    x0: Optional[jnp.ndarray] = None,  # (n,) warm start
    y0: Optional[jnp.ndarray] = None,  # (m,)
):
    """Solve one stage-structured QP without dense operators.

    Returns the same ``QPSolution`` tuple as :func:`.admm.admm_solve`.
    ``jax.vmap`` over a batched :class:`BandedQP` batches scenarios.
    """
    from .admm import QPSolution

    st = settings
    dtype = qp.Hb.dtype
    N, w = qp.Hb.shape[0], qp.Hb.shape[1]
    n = N * w
    m = qp.l.shape[0]
    sigma = jnp.asarray(st.sigma, dtype)
    alpha = jnp.asarray(st.alpha, dtype)
    qp = qp._replace(
        l=jnp.minimum(qp.l.astype(dtype), qp.u.astype(dtype)),
        u=qp.u.astype(dtype),
        q=qp.q.astype(dtype),
    )
    qp, D, E, c = ruiz_equilibrate_banded(qp, st.scaling_iters)
    l, u, q = qp.l, qp.u, qp.q
    Dinv, Einv, cinv = 1.0 / D, 1.0 / E, 1.0 / c

    if st.banded_solver == "cr":
        factor, solve = cr_factor, cr_solve
    elif st.banded_solver == "thomas":
        factor, solve = btd_factor, btd_solve
    else:
        raise ValueError(f"unknown banded_solver: {st.banded_solver!r}")

    rho_v = _rho_vec(l, u, jnp.asarray(st.rho, dtype), dtype)
    diag, lower = _build_M_blocks(qp, rho_v, sigma)
    fac = factor(diag, lower)

    x = jnp.zeros((n,), dtype) if x0 is None else (x0.astype(dtype) * Dinv)
    y = jnp.zeros((m,), dtype) if y0 is None else (c * y0.astype(dtype) * Einv)
    z = jnp.clip(_apply_A(qp, x.reshape(N, w)), l, u)

    def one_iter(carry, _):
        x, z, y, rho, fac = carry
        rhs = sigma * x - q + _apply_AT(qp, rho * z - y).reshape(-1)
        xt = solve(fac, rhs.reshape(N, w)).reshape(-1)
        zt = _apply_A(qp, xt.reshape(N, w))
        x_new = alpha * xt + (1 - alpha) * x
        z_rel = alpha * zt + (1 - alpha) * z
        z_new = jnp.clip(z_rel + y / rho, l, u)
        y_new = y + rho * (z_rel - z_new)
        return (x_new, z_new, y_new, rho, fac), None

    def residuals(x, z, y):
        # Unscaled residuals (OSQP): divide rows by E, variables by D,
        # dual quantities additionally by the cost scaling c.
        return banded_residuals(qp, x, z, y, Einv, Dinv, cinv, st)

    def infeasibility_certificates(dx_s, dy_s):
        return banded_certificates(qp, dx_s, dy_s, D, E, cinv, st)

    # Round-based iteration (see solvers/admm.py): rho/factorization stay
    # constant for one adaptation interval, adaptation happens BETWEEN
    # rounds — a per-check-block lax.cond would evaluate both branches
    # under vmap, refactorizing every 25 iterations for every scenario
    # (measured 3.8x slower on cart-pole h20 B=256).
    if st.adaptive_rho:
        interval = max(st.adaptive_rho_interval, st.check_every)
        interval = (
            (interval + st.check_every - 1) // st.check_every
        ) * st.check_every
    else:
        interval = st.max_iter

    def run_round(rho, fac, it0, x, z, y, done, pinf, dinf):
        def icond(s):
            k, x, z, y, done, pinf, dinf, rp, rd, rpr, rdr = s
            stop = jnp.logical_or(done, jnp.logical_or(pinf, dinf))
            return jnp.logical_and(
                k < interval,
                jnp.logical_and(it0 + k < st.max_iter, jnp.logical_not(stop)),
            )

        def ibody(s):
            k, x, z, y, done, pinf, dinf, _, _, _, _ = s
            x_old, y_old = x, y
            (x, z, y, _, _), _ = jax.lax.scan(
                one_iter, (x, z, y, rho, fac), None, length=st.check_every
            )
            r_prim, r_dual, eps_pri, eps_dua, rp_rel, rd_rel = residuals(
                x, z, y
            )
            done = jnp.logical_and(r_prim <= eps_pri, r_dual <= eps_dua)
            if st.check_infeasibility:
                pinf, dinf = infeasibility_certificates(x - x_old, y - y_old)
                pinf = jnp.logical_and(pinf, jnp.logical_not(done))
                dinf = jnp.logical_and(dinf, jnp.logical_not(done))
            return (
                k + st.check_every, x, z, y, done, pinf, dinf,
                r_prim, r_dual, rp_rel, rd_rel,
            )

        big = jnp.asarray(jnp.inf, dtype)
        return jax.lax.while_loop(
            icond,
            ibody,
            (jnp.asarray(0, jnp.int32), x, z, y, done, pinf, dinf,
             big, big, big, big),
        )

    def cond_fn(state):
        it, x, z, y, rho, fac, done, pinf, dinf, rp, rd = state
        stop = jnp.logical_or(done, jnp.logical_or(pinf, dinf))
        return jnp.logical_and(it < st.max_iter, jnp.logical_not(stop))

    def body_fn(state):
        it, x, z, y, rho, fac, done, pinf, dinf, _, _ = state
        k, x, z, y, done, pinf, dinf, r_prim, r_dual, rp_rel, rd_rel = (
            run_round(rho, fac, it, x, z, y, done, pinf, dinf)
        )
        it = it + k
        if st.adaptive_rho:
            def maybe_adapt(args):
                rho, fac = args
                scale = jnp.sqrt(rp_rel / jnp.maximum(rd_rel, 1e-12))
                scale = jnp.clip(scale, 1e-3, 1e3)
                trigger = jnp.logical_or(
                    scale > st.adaptive_rho_tolerance,
                    scale < 1.0 / st.adaptive_rho_tolerance,
                )

                def adapt(_):
                    new_rho = jnp.clip(rho * scale, _RHO_MIN, _RHO_MAX)
                    d, lo = _build_M_blocks(qp, new_rho, sigma)
                    return new_rho, factor(d, lo)

                return jax.lax.cond(
                    jnp.logical_and(trigger, jnp.logical_not(done)),
                    adapt,
                    lambda _: (rho, fac),
                    None,
                )

            rho, fac = maybe_adapt((rho, fac))
        return (it, x, z, y, rho, fac, done, pinf, dinf, r_prim, r_dual)

    inf = jnp.asarray(jnp.inf, dtype)
    f0 = jnp.asarray(False)
    state = (
        jnp.asarray(0, jnp.int32),
        x,
        z,
        y,
        rho_v,
        fac,
        f0,
        f0,
        f0,
        inf,
        inf,
    )
    it, x, z, y, rho_v, fac, done, pinf, dinf, r_prim, r_dual = (
        jax.lax.while_loop(cond_fn, body_fn, state)
    )

    if st.polish:
        x, y, z, r_prim, r_dual = banded_polish(
            qp, st, factor, solve, x, y, z, r_prim, r_dual,
            Einv, Dinv, cinv,
        )

    return QPSolution(
        x=D * x,
        y=E * y * cinv,
        z=z * Einv,
        iters=it,
        converged=done,
        r_prim=r_prim,
        r_dual=r_dual,
        prim_inf=pinf,
        dual_inf=dinf,
    )
