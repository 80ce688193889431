"""Sequence-parallel ADMM: the banded OCP QP solved with the horizon
sharded across a device mesh.

Combines :mod:`..solvers.admm_banded` (block-structured OSQP iteration) with
the SPIKE partition solve of :mod:`.horizon`: every stage-local quantity
(Hessian blocks, Jacobian blocks, bounds, iterates) lives sharded over the
mesh axis; each ADMM iteration does

* neighbor ``ppermute`` exchanges for the off-by-one dynamics couplings
  (apply A / A^T across chunk boundaries),
* a local block-LDL^T solve against the precomputed chunk factorization,
* one small ``all_gather`` (O(D w)) for the reduced interface system,

and termination reductions ride ``pmax`` — all ICI traffic, no host.  This
is the OCP analog of context/sequence parallelism (SURVEY.md sections 2, 5):
horizons too long for one device's memory/latency budget scale across the
mesh instead.

Full OSQP semantics distributed: modified Ruiz equilibration runs at setup
(one neighbor exchange each way plus one psum/pmax over the horizon axis
per scaling sweep), and adaptive rho runs round-based — each adaptation
interval refactorizes the SPIKE partition with the rescaled rho, the
trigger being a globally-reduced replicated scalar so every device's
collectives stay uniform.
"""

from __future__ import annotations


from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.block_tridiag import btd_factor, btd_solve, btd_solve_mat
from ..solvers.admm import (
    ADMMSettings,
    _RHO_EQ_OVER_RHO_INEQ,
    _RHO_MAX,
    _RHO_MIN,
    _RHO_TOL,
    _limit_scaling,
    f32_matmuls,
)

__all__ = ["ShardedBandedQP", "admm_solve_seq_parallel"]


class ShardedBandedQP(NamedTuple):
    """Per-stage layout of a stage-structured QP (leading dim = stages N).

    ``J0``/``J1`` are padded to N rows (row k = dynamics residual k for
    k < N-1; row N-1 zero).  Bounds are per-stage: ``lx``/``ux`` (N, w) box
    rows, ``ld``/``ud`` (N, r) dynamics rows (row N-1 ignored), ``lc``/``uc``
    (N, r2) stage-constraint rows.
    """

    Hb: jnp.ndarray  # (N, w, w)
    J0: jnp.ndarray  # (N, r, w)
    J1: jnp.ndarray  # (N, r, w)
    Jc: jnp.ndarray  # (N, r2, w)
    q: jnp.ndarray  # (N, w)
    lx: jnp.ndarray
    ux: jnp.ndarray
    ld: jnp.ndarray
    ud: jnp.ndarray
    lc: jnp.ndarray
    uc: jnp.ndarray


def _rho_of(l, u, rho, dtype):
    loose = jnp.logical_and(l <= -jnp.inf, u >= jnp.inf)
    eq = (u - l) < _RHO_TOL
    r = jnp.full(l.shape, rho, dtype)
    r = jnp.where(eq, jnp.clip(rho * _RHO_EQ_OVER_RHO_INEQ, _RHO_MIN, _RHO_MAX), r)
    return jnp.where(loose, _RHO_MIN, r)




def _ruiz_seq_local(
    Hb, J0, J1, Jc, q, *, iters, axis, D, is_first, is_last,
    right_shift, left_shift,
):
    """Distributed modified Ruiz equilibration over the sharded stages.

    Mirrors :func:`..solvers.admm_banded.ruiz_equilibrate_banded` with the
    horizon axis sharded.  Per sweep: one right-shift delivers each
    residual row's J1 column-norm contribution to the next stage, one
    left-shift fetches the next stage's variable scaling for the J1 row
    norms, and the cost scaling reduces with one psum + pmax over ``axis``.
    Returns per-stage factors (Dv, Ex, Ed, Ec) and the scalar cost
    scaling c; padded dynamics rows (all-zero J0/J1) keep Ed = 1.
    """
    dtype = Hb.dtype
    C, w = Hb.shape[0], Hb.shape[1]
    r = J0.shape[1]
    r2 = Jc.shape[1]
    N = C * D

    def body(_, carry):
        Dv, Ex, Ed, Ec, c = carry
        # Column inf-norms of the scaled [P; A] per variable (pre-update
        # scalings, as in the dense/banded paths).
        Pcol = jnp.max(
            jnp.abs(c * Dv[:, :, None] * Hb * Dv[:, None, :]), axis=1
        )
        norm_x = jnp.maximum(Pcol, jnp.abs(Ex * Dv))
        if r:
            norm_x = jnp.maximum(
                norm_x, jnp.max(jnp.abs(Ed[:, :, None] * J0), axis=1) * Dv
            )
            # Residual row k couples stage k+1 through J1: deliver row
            # C-1's contribution to the right neighbor's first stage.
            t = jnp.max(jnp.abs(Ed[:, :, None] * J1), axis=1)  # (C, w)
            t_prev = right_shift(t[-1])
            t_sh = jnp.concatenate([t_prev[None], t[:-1]], axis=0)
            t_sh = t_sh.at[0].multiply(jnp.where(is_first, 0.0, 1.0))
            norm_x = jnp.maximum(norm_x, t_sh * Dv)
        if r2:
            norm_x = jnp.maximum(
                norm_x, jnp.max(jnp.abs(Ec[:, :, None] * Jc), axis=1) * Dv
            )
        # Row inf-norms of the scaled A (same pre-update scalings).
        rowx = jnp.abs(Ex * Dv)
        if r:
            Dn_first = left_shift(Dv[0])
            Dv_next = jnp.concatenate([Dv[1:], Dn_first[None]], axis=0)
            row_d = Ed * jnp.maximum(
                jnp.max(jnp.abs(J0 * Dv[:, None, :]), axis=2),
                jnp.max(jnp.abs(J1 * Dv_next[:, None, :]), axis=2),
            )
        if r2:
            row_c = Ec * jnp.max(jnp.abs(Jc * Dv[:, None, :]), axis=2)
        Dv = Dv / jnp.sqrt(_limit_scaling(norm_x))
        Ex = Ex / jnp.sqrt(_limit_scaling(rowx))
        if r:
            Ed = Ed / jnp.sqrt(_limit_scaling(row_d))
        if r2:
            Ec = Ec / jnp.sqrt(_limit_scaling(row_c))
        # Cost scaling (post-update Dv): gamma = 1/max(mean P col-norm,
        # ||qb||_inf), both global over the horizon axis.
        Pcol = jnp.max(
            jnp.abs(c * Dv[:, :, None] * Hb * Dv[:, None, :]), axis=1
        )
        mean_pcol = jax.lax.psum(jnp.sum(Pcol), axis) / (N * w)
        qmax = jax.lax.pmax(jnp.max(jnp.abs(c * Dv * q)), axis)
        gamma = 1.0 / _limit_scaling(jnp.maximum(mean_pcol, qmax))
        return Dv, Ex, Ed, Ec, c * gamma

    # Initial factors must carry the same varying-axes type as the loop
    # body's outputs (shard_map value typing): derive the ones from the
    # problem data instead of fresh constants.  c's body output is a psum
    # over ``axis`` (unvarying there, varying over any enclosing batch
    # axis), so its init mirrors that exact collective profile.
    Dv = 1.0 + 0.0 * Hb[:, :, 0]
    Ex = 1.0 + 0.0 * Hb[:, :, 0]
    Ed = 1.0 + 0.0 * J0[:, :, 0] if r else jnp.zeros((C, 0), dtype)
    Ec = 1.0 + 0.0 * Jc[:, :, 0] if r2 else jnp.zeros((C, 0), dtype)
    c = 1.0 + 0.0 * jax.lax.psum(jnp.sum(Hb[:, 0, 0]), axis)
    if iters > 0:
        Dv, Ex, Ed, Ec, c = jax.lax.fori_loop(
            0, iters, body, (Dv, Ex, Ed, Ec, c)
        )
    return Dv, Ex, Ed, Ec, c


def seq_admm_local(
    Hb, J0, J1, Jc, q, lx, ux, ld, ud, lc, uc, *, settings, axis, D,
    sync_axes=None, warm=None,
):
    """The per-device ADMM computation; call INSIDE a shard_map over
    ``axis`` (directly, or via :func:`admm_solve_seq_parallel`).  All
    arguments are local shards (leading dim C = stages per device).

    ``sync_axes``: mesh axes to synchronize termination over (default:
    just ``axis``).  When embedded in a multi-axis mesh, pass ALL axes —
    collective permutes must execute the same number of loop iterations on
    every participating device, or partial-axis groups deadlock on
    runtimes that rendezvous globally.
    """
    st = settings
    if sync_axes is None:
        sync_axes = (axis,)
    dtype = Hb.dtype
    C, w, _ = Hb.shape
    r = J0.shape[1]
    r2 = Jc.shape[1]

    def right_shift(t):
        """Row from the LEFT neighbor's last stage (device d-1 -> d)."""
        return jax.lax.ppermute(t, axis, [(i, (i + 1) % D) for i in range(D)])

    def left_shift(t):
        """Row from the RIGHT neighbor's first stage (device d+1 -> d)."""
        return jax.lax.ppermute(t, axis, [(i, (i - 1) % D) for i in range(D)])

    d = jax.lax.axis_index(axis)
    is_first = d == 0
    is_last = d == D - 1
    sigma = jnp.asarray(st.sigma, dtype)
    alpha = jnp.asarray(st.alpha, dtype)

    # ---- distributed Ruiz equilibration (setup-time, static trip count) --
    Dv, Exs, Eds, Ecs, c = _ruiz_seq_local(
        Hb, J0, J1, Jc, q,
        iters=st.scaling_iters, axis=axis, D=D,
        is_first=is_first, is_last=is_last,
        right_shift=right_shift, left_shift=left_shift,
    )
    Dn_first = left_shift(Dv[0])
    Dv_next = jnp.concatenate([Dv[1:], Dn_first[None]], axis=0)
    Hb = c * Dv[:, :, None] * Hb * Dv[:, None, :]
    J0 = Eds[:, :, None] * J0 * Dv[:, None, :] if r else J0
    J1 = Eds[:, :, None] * J1 * Dv_next[:, None, :] if r else J1
    Jc = Ecs[:, :, None] * Jc * Dv[:, None, :] if r2 else Jc
    q = c * Dv * q
    lx, ux = Exs * lx, Exs * ux
    ld, ud = Eds * ld, Eds * ud
    lc, uc = Ecs * lc, Ecs * uc
    cinv = 1.0 / c

    rho_x = _rho_of(lx, ux, jnp.asarray(st.rho, dtype), dtype)  # (C, w)
    rho_d = _rho_of(ld, ud, jnp.asarray(st.rho, dtype), dtype)  # (C, r)
    rho_c = _rho_of(lc, uc, jnp.asarray(st.rho, dtype), dtype)  # (C, r2)
    # Row C-1 of the dynamics block on the last device is padding.
    last_mask = jnp.logical_and(is_last, True)
    dyn_valid = jnp.ones((C, 1), dtype)
    dyn_valid = jnp.where(
        jnp.logical_and(last_mask, jnp.arange(C)[:, None] == C - 1),
        0.0,
        dyn_valid,
    )
    rho_d = rho_d * dyn_valid + (1 - dyn_valid) * _RHO_MIN

    # Neighbor rows needed for M assembly and A^T application.
    J0_prev = right_shift(J0[-1])  # left neighbor's last dyn row
    J1_prev = right_shift(J1[-1])
    g = lambda t: jax.lax.all_gather(t, axis)
    nred = 2 * D * w

    def spike_setup(rho_x, rho_d, rho_c):
        """Assemble M = P + sigma I + A^T R A and build the SPIKE partition
        factorization (local block LDL^T + WL/WR spikes + reduced interface
        inverse).  Runs once per rho round; rho adaptation re-enters here."""
        rho_d_prev = right_shift(rho_d[-1])
        diag = (
            Hb
            + sigma * jnp.eye(w, dtype=dtype)[None]
            + jax.vmap(jnp.diag)(rho_x)
        )
        if r:
            diag = diag + jnp.einsum("kr,krw,krv->kwv", rho_d, J0, J0)
            # contribution of residual row k-1 through J1 on stage k:
            J1_sh = jnp.concatenate([J1_prev[None], J1[:-1]], axis=0)
            rho_sh = jnp.concatenate([rho_d_prev[None], rho_d[:-1]], axis=0)
            J1_sh = J1_sh.at[0].multiply(jnp.where(is_first, 0.0, 1.0))
            diag = diag + jnp.einsum("kr,krw,krv->kwv", rho_sh, J1_sh, J1_sh)
            # subdiagonal L_k = J1_{k-1}^T R J0_{k-1}; local row k holds L_k.
            J0_sh = jnp.concatenate([J0_prev[None], J0[:-1]], axis=0)
            lower = jnp.einsum("kr,krw,krv->kwv", rho_sh, J1_sh, J0_sh)
            lower = lower.at[0].multiply(jnp.where(is_first, 0.0, 1.0))
        else:
            lower = jnp.zeros((C, w, w), dtype)
        if r2:
            diag = diag + jnp.einsum("kr,krw,krv->kwv", rho_c, Jc, Jc)

        fac = btd_factor(diag, lower[1:])
        L0 = jnp.where(is_first, jnp.zeros((w, w), dtype), lower[0])
        BL = jnp.zeros((C, w, w), dtype).at[0].set(L0)
        next_L = left_shift(lower[0])
        Ln = jnp.where(is_last, jnp.zeros((w, w), dtype), next_L)
        BR = jnp.zeros((C, w, w), dtype).at[-1].set(Ln.T)
        WL = btd_solve_mat(fac, BL)
        WR = btd_solve_mat(fac, BR)
        WL0, WL1 = g(WL[0]), g(WL[-1])
        WR0, WR1 = g(WR[0]), g(WR[-1])
        K = jnp.eye(nred, dtype=dtype)
        for dd in range(D):
            rf = 2 * dd * w
            rl = rf + w
            if dd > 0:
                cl = (2 * (dd - 1) + 1) * w
                K = K.at[rf : rf + w, cl : cl + w].add(WL0[dd])
                K = K.at[rl : rl + w, cl : cl + w].add(WL1[dd])
            if dd < D - 1:
                cf = 2 * (dd + 1) * w
                K = K.at[rf : rf + w, cf : cf + w].add(WR0[dd])
                K = K.at[rl : rl + w, cf : cf + w].add(WR1[dd])
        Kinv = jnp.linalg.inv(K)
        return fac, WL, WR, Kinv

    def spike_solve(ops, rhs):
        fac, WL, WR, Kinv = ops
        v = btd_solve(fac, rhs)
        v0, v1 = g(v[0]), g(v[-1])
        rred = jnp.stack([v0, v1], axis=1).reshape(nred)
        u = Kinv @ rred
        l_prev = jax.lax.dynamic_slice(u, ((2 * ((d - 1) % D) + 1) * w,), (w,))
        l_prev = jnp.where(is_first, jnp.zeros((w,), dtype), l_prev)
        f_next = jax.lax.dynamic_slice(u, ((2 * ((d + 1) % D)) * w,), (w,))
        f_next = jnp.where(is_last, jnp.zeros((w,), dtype), f_next)
        return (
            v
            - jnp.einsum("kij,j->ki", WL, l_prev)
            - jnp.einsum("kij,j->ki", WR, f_next)
        )

    # ---- A / A^T with boundary exchanges ----
    def apply_A(x):
        ax_x = x
        if r:
            x_next_first = left_shift(x[0])
            x_next = jnp.concatenate([x[1:], x_next_first[None]], axis=0)
            x_next = x_next.at[-1].multiply(jnp.where(is_last, 0.0, 1.0))
            ax_d = jnp.einsum("krw,kw->kr", J0, x) + jnp.einsum(
                "krw,kw->kr", J1, x_next
            )
            ax_d = ax_d * dyn_valid
        else:
            ax_d = jnp.zeros((C, 0), dtype)
        ax_c = jnp.einsum("krw,kw->kr", Jc, x) if r2 else jnp.zeros((C, 0), dtype)
        return ax_x, ax_d, ax_c

    def apply_AT(tx, td, tc):
        out = tx
        if r:
            out = out + jnp.einsum("krw,kr->kw", J0, td)
            td_prev = right_shift(td[-1])
            td_sh = jnp.concatenate([td_prev[None], td[:-1]], axis=0)
            td_sh = td_sh.at[0].multiply(jnp.where(is_first, 0.0, 1.0))
            J1_sh_ = jnp.concatenate([J1_prev[None], J1[:-1]], axis=0)
            out = out + jnp.einsum("krw,kr->kw", J1_sh_, td_sh)
        if r2:
            out = out + jnp.einsum("krw,kr->kw", Jc, tc)
        return out

    # ---- ADMM loop (sharded state) ----
    # Derive initial iterates from varying inputs (fresh zeros would be
    # "unvarying" under shard_map's value typing — and must vary over every
    # mesh axis the enclosing context uses, including a vmapped batch axis).
    # Warm starts arrive in UNSCALED units (caller-visible semantics, same
    # as admm_solve's x0/y0): map into the scaled frame.
    if warm is None:
        x = q * 0.0
        yx = lx * 0.0
        yd = ld * 0.0
        yc = lc * 0.0
    else:
        x_u, yx_u, yd_u, yc_u = warm
        x = x_u / Dv
        yx = c * yx_u / Exs
        yd = c * yd_u / Eds if r else yd_u
        yc = c * yc_u / Ecs if r2 else yc_u
    zx, zd, zc = apply_A(x)
    zx = jnp.clip(zx, lx, ux)
    zd = jnp.clip(zd, ld, ud) * dyn_valid
    zc = jnp.clip(zc, lc, uc)

    def one_iter(rhos, ops, carry):
        rho_x, rho_d, rho_c = rhos
        x, zx, zd, zc, yx, yd, yc = carry
        rhs = sigma * x - q + apply_AT(
            rho_x * zx - yx, rho_d * zd - yd, rho_c * zc - yc
        )
        xt = spike_solve(ops, rhs)
        ztx, ztd, ztc = apply_A(xt)
        x_new = alpha * xt + (1 - alpha) * x

        def upd(zt, z, y, rho, lo, hi):
            z_rel = alpha * zt + (1 - alpha) * z
            z_new = jnp.clip(z_rel + y / rho, lo, hi)
            y_new = y + rho * (z_rel - z_new)
            return z_new, y_new

        zx_n, yx_n = upd(ztx, zx, yx, rho_x, lx, ux)
        zd_n, yd_n = upd(ztd, zd, yd, rho_d, ld, ud)
        zc_n, yc_n = upd(ztc, zc, yc, rho_c, lc, uc)
        zd_n = zd_n * dyn_valid
        yd_n = yd_n * dyn_valid
        return (x_new, zx_n, zd_n, zc_n, yx_n, yd_n, yc_n)

    def residuals(x, zx, zd, zc, yx, yd, yc):
        # Unscaled residuals (OSQP): rows divided by their E factor,
        # variables by Dv, dual quantities by the cost scaling c.
        ax, ad, ac = apply_A(x)
        px = jnp.einsum("kij,kj->ki", Hb, x)
        aty = apply_AT(yx, yd, yc)
        exi, edi, eci = 1.0 / Exs, 1.0 / Eds, 1.0 / Ecs
        dvi = 1.0 / Dv
        cat = lambda a, b, c_: jnp.concatenate(
            [a.reshape(-1), b.reshape(-1), c_.reshape(-1)]
        )
        rp_loc = jnp.max(
            jnp.abs(
                cat(
                    (ax - zx) * exi,
                    (ad - zd) * dyn_valid * edi,
                    (ac - zc) * eci,
                )
            )
        )
        rd_loc = cinv * jnp.max(jnp.abs((px + q + aty) * dvi))
        mp_loc = jnp.maximum(
            jnp.max(jnp.abs(cat(ax * exi, ad * edi, ac * eci))),
            jnp.max(jnp.abs(cat(zx * exi, zd * edi, zc * eci))),
        )
        md_loc = cinv * jnp.maximum(
            jnp.maximum(
                jnp.max(jnp.abs(aty * dvi)), jnp.max(jnp.abs(px * dvi))
            ),
            jnp.max(jnp.abs(q * dvi)),
        )
        pm = lambda t: jax.lax.pmax(t, sync_axes)
        r_prim, r_dual = pm(rp_loc), pm(rd_loc)
        max_prim, max_dual = pm(mp_loc), pm(md_loc)
        eps_pri = st.eps_abs + st.eps_rel * max_prim
        eps_dua = st.eps_abs + st.eps_rel * max_dual
        done = jnp.logical_and(r_prim <= eps_pri, r_dual <= eps_dua)
        return done, r_prim, r_dual, max_prim, max_dual

    def certificates(dx, dyx, dyd, dyc):
        """OSQP infeasibility certificates (Banjac et al.) on one check
        block's SCALED iterate deltas; every test runs on unscaled
        quantities (same conventions as ``residuals``).  Reductions span
        the HORIZON axis only — a certificate is a per-problem statement,
        so on a 2-D (scenarios x horizon) mesh each scenario keeps its own
        flags (varying over the batch axis); the loop-exit scalar is
        reduced separately in the caller."""
        tiny = jnp.asarray(1e-12, dtype)
        pm = lambda t: jax.lax.pmax(t, axis)
        ps = lambda t: jax.lax.psum(t, axis)
        cat = lambda a, b, c_: jnp.concatenate(
            [a.reshape(-1), b.reshape(-1), c_.reshape(-1)]
        )
        exi, edi, eci = 1.0 / Exs, 1.0 / Eds, 1.0 / Ecs
        dvi = 1.0 / Dv
        # -- primal infeasibility: delta_y with A^T dy ~ 0 and support
        #    function u'(dy)_+ + l'(dy)_- < 0 (padded dynamics rows carry
        #    zero deltas by construction: one_iter masks yd with dyn_valid).
        dyd = dyd * dyn_valid if r else dyd
        dyx_u = dyx * exi * cinv
        dyd_u = dyd * edi * cinv if r else dyd
        dyc_u = dyc * eci * cinv if r2 else dyc
        ndy = pm(jnp.max(jnp.abs(cat(dyx_u, dyd_u, dyc_u))))

        def support_of(dy_u, lo_s, hi_s, e_inv):
            # Masked products so inf * 0 cannot produce NaN; an infinite
            # bound with matching delta sign yields +inf, correctly
            # blocking the certificate.
            dy_p = jnp.maximum(dy_u, 0.0)
            dy_m = jnp.minimum(dy_u, 0.0)
            t_u = jnp.where(dy_p > 0, (hi_s * e_inv) * dy_p, 0.0)
            t_l = jnp.where(dy_m < 0, (lo_s * e_inv) * dy_m, 0.0)
            return jnp.sum(t_u + t_l)

        support = support_of(dyx_u, lx, ux, exi)
        if r:
            support = support + support_of(dyd_u, ld, ud, edi)
        if r2:
            support = support + support_of(dyc_u, lc, uc, eci)
        support = ps(support)
        atdy_u = cinv * apply_AT(dyx, dyd, dyc) * dvi
        n_Atdy = pm(jnp.max(jnp.abs(atdy_u)))
        pinf = jnp.logical_and(
            ndy > tiny,
            jnp.logical_and(
                support < -st.eps_prim_inf * ndy,
                n_Atdy < st.eps_prim_inf * ndy,
            ),
        )
        # -- dual infeasibility: delta_x with P dx ~ 0, q'dx < 0 and A dx
        #    consistent with a feasible recession direction.
        dx_u = Dv * dx
        ndx = pm(jnp.max(jnp.abs(dx_u)))
        thr = st.eps_dual_inf * ndx
        cond_q = ps(jnp.sum(q * dx)) * cinv < -thr
        Pdx_u = cinv * jnp.einsum("kij,kj->ki", Hb, dx) * dvi
        cond_P = pm(jnp.max(jnp.abs(Pdx_u))) < thr
        ax, ad, ac = apply_A(dx)
        adx_u = cat(ax * exi, ad * dyn_valid * edi, ac * eci)
        lo_u = cat(lx * exi, ld * edi, lc * eci)
        hi_u = cat(ux * exi, ud * edi, uc * eci)
        below = jnp.all(jnp.where(hi_u < jnp.inf, adx_u < thr, True))
        above = jnp.all(jnp.where(lo_u > -jnp.inf, adx_u > -thr, True))
        # all() must hold on EVERY device: pmax-reduce the violation flag.
        viol = jnp.logical_not(jnp.logical_and(below, above)).astype(dtype)
        cond_A = pm(viol) < 0.5
        dinf = jnp.logical_and(
            ndx > tiny,
            jnp.logical_and(cond_q, jnp.logical_and(cond_P, cond_A)),
        )
        return pinf, dinf

    # ---- rho rounds: SPIKE setup once per adaptation interval ----------
    # Collectives must execute uniformly, so adaptation is round-based:
    # each outer round refactorizes with the current rho (the trigger is a
    # globally-reduced, replicated scalar — every device scales alike),
    # then the inner loop runs up to `interval` iterations with early
    # termination synced over `sync_axes`.  adaptive_rho=False is a single
    # round, i.e. exactly the previous fixed-rho behavior.
    if st.adaptive_rho:
        interval = max(st.adaptive_rho_interval, st.check_every)
        interval = (
            (interval + st.check_every - 1) // st.check_every
        ) * st.check_every
    else:
        interval = st.max_iter

    def stop_of(done, pinf, dinf):
        """Replicated loop-exit scalar: every scenario converged OR
        certified.  ``done`` is already globally synced; the per-scenario
        certificate flags (varying over an outer batch mesh axis) reduce
        here so trip counts stay uniform across ALL devices."""
        go = jnp.logical_not(
            jnp.logical_or(done, jnp.logical_or(pinf, dinf))
        ).astype(dtype)
        return jax.lax.pmax(go, sync_axes) < 0.5

    def run_round(rhos, it0, carry, done, pinf, dinf, stop):
        ops = spike_setup(*rhos)

        def icond(s):
            k, carry, done, pinf, dinf, stop, _ = s
            return jnp.logical_and(
                k < interval,
                jnp.logical_and(it0 + k < st.max_iter, jnp.logical_not(stop)),
            )

        def ibody(s):
            k, carry, done, pinf, dinf, stop, _ = s
            x_o, yx_o, yd_o, yc_o = carry[0], carry[4], carry[5], carry[6]
            carry = jax.lax.fori_loop(
                0, st.check_every, lambda _, c: one_iter(rhos, ops, c), carry
            )
            done, rp, rd, mp, md = residuals(*carry)
            if st.check_infeasibility:
                pi, di_ = certificates(
                    carry[0] - x_o,
                    carry[4] - yx_o,
                    carry[5] - yd_o,
                    carry[6] - yc_o,
                )
                pinf = jnp.logical_or(
                    pinf, jnp.logical_and(pi, jnp.logical_not(done))
                )
                dinf = jnp.logical_or(
                    dinf, jnp.logical_and(di_, jnp.logical_not(done))
                )
            stop = stop_of(done, pinf, dinf)
            return (
                k + st.check_every, carry, done, pinf, dinf, stop,
                (rp, rd, mp, md),
            )

        # Init residual slots with the same varying-axes type as the
        # pmax-reduced outputs of residuals() (unvarying over sync_axes).
        zero = 0.0 * jax.lax.pmax(jnp.max(jnp.abs(q)), sync_axes)
        k, carry, done, pinf, dinf, stop, (rp, rd, mp, md) = (
            jax.lax.while_loop(
                icond, ibody,
                (jnp.asarray(0, jnp.int32), carry, done, pinf, dinf, stop,
                 (zero, zero, zero, zero)),
            )
        )
        return k, carry, done, pinf, dinf, stop, (rp, rd, mp, md)

    carry0 = (x, zx, zd, zc, yx, yd, yc)
    # Evaluate termination once up front: gives a correctly-typed initial
    # flag (unvarying over the pmax axis, varying over any enclosing batch
    # axes) and an immediate exit for already-converged warm starts.
    done0, *_ = residuals(*carry0)
    # Certificate flags are per-scenario: unvarying over the horizon axis
    # only (certificates() reduces over `axis`), varying over any batch
    # mesh axis — type the False inits accordingly.
    false0 = jax.lax.pmax(jnp.max(jnp.abs(q)), axis) < -1.0
    stop0 = stop_of(done0, false0, false0)
    rhos0 = (rho_x, rho_d, rho_c)

    def ocond(s):
        it, carry, rhos, done, pinf, dinf, stop = s
        return jnp.logical_and(it < st.max_iter, jnp.logical_not(stop))

    def obody(s):
        it, carry, rhos, done, pinf, dinf, stop = s
        k, carry, done, pinf, dinf, stop, (rp, rd, mp, md) = run_round(
            rhos, it, carry, done, pinf, dinf, stop
        )
        it = it + k
        if st.adaptive_rho:
            # OSQP rho rule on globally-reduced (replicated) residuals —
            # every device computes the identical scale, so the next
            # round's refactorization collectives stay uniform.
            num = rp / jnp.maximum(mp, 1e-10)
            den = rd / jnp.maximum(md, 1e-10)
            scale = jnp.clip(
                jnp.sqrt(num / jnp.maximum(den, 1e-10)), 1e-3, 1e3
            )
            trigger = jnp.logical_or(
                scale > st.adaptive_rho_tolerance,
                scale < 1.0 / st.adaptive_rho_tolerance,
            )
            s_eff = jnp.where(
                jnp.logical_and(trigger, jnp.logical_not(stop)), scale, 1.0
            )
            rho_x_n = jnp.clip(rhos[0] * s_eff, _RHO_MIN, _RHO_MAX)
            rho_d_n = jnp.clip(rhos[1] * s_eff, _RHO_MIN, _RHO_MAX)
            rho_c_n = jnp.clip(rhos[2] * s_eff, _RHO_MIN, _RHO_MAX)
            rho_d_n = rho_d_n * dyn_valid + (1 - dyn_valid) * _RHO_MIN
            rhos = (rho_x_n, rho_d_n, rho_c_n)
        return it, carry, rhos, done, pinf, dinf, stop

    it, carry, rhos, done, pinf, dinf, stop = jax.lax.while_loop(
        ocond, obody,
        (jnp.asarray(0, jnp.int32), carry0, rhos0, done0, false0, false0,
         stop0),
    )
    x, zx, zd, zc, yx, yd, yc = carry
    x_u = Dv * x
    warm_u = (
        x_u,
        Exs * yx * cinv,
        Eds * yd * cinv if r else yd,
        Ecs * yc * cinv if r2 else yc,
    )
    full = lambda t: jnp.full((C,), t)
    return x_u, jnp.full((C,), it, jnp.int32), full(done), full(pinf), full(dinf), warm_u


def admm_solve_seq_parallel(
    qp: ShardedBandedQP,
    settings: ADMMSettings,
    *,
    mesh: Mesh,
    axis: str = "h",
):
    """Solve the stage-structured QP with stages sharded over ``mesh[axis]``.

    Returns ``(x (N, w), iters, converged, prim_inf, dual_inf)``.  Iterates
    are sharded per-stage; only interface-sized data crosses devices.
    ``prim_inf``/``dual_inf`` are the OSQP infeasibility certificates
    (False-filled when ``settings.check_infeasibility`` is off); a certified
    QP exits the loop early instead of running to ``max_iter``.
    """
    N, w, _ = qp.Hb.shape
    r = qp.J0.shape[1]
    r2 = qp.Jc.shape[1]
    D = mesh.shape[axis]
    C = N // D
    if C * D != N or C < 2:
        raise ValueError(f"horizon {N} must split into >=2 stages per device over {D}")
    st = settings

    st = settings

    def body(Hb, J0, J1, Jc, q, lx, ux, ld, ud, lc, uc):
        x, it, done, pinf, dinf, _warm = seq_admm_local(
            Hb, J0, J1, Jc, q, lx, ux, ld, ud, lc, uc,
            settings=st, axis=axis, D=D,
        )
        return x, it, done, pinf, dinf

    shard = NamedSharding(mesh, P(axis))
    args = [jax.device_put(a, shard) for a in qp]
    solve = jax.jit(
        f32_matmuls(
            jax.shard_map(
                body,
                mesh=mesh,
                in_specs=tuple(P(axis) for _ in qp),
                out_specs=tuple(P(axis) for _ in range(5)),
            )
        )
    )
    x, its, dones, pinfs, dinfs = solve(*args)
    return x, its[0], dones[0], pinfs[0], dinfs[0]
