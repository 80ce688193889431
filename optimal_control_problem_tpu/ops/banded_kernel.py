"""Pallas TPU kernel: fused block-tridiagonal ADMM chunk, batch-last layout.

Why this exists: the banded ADMM (``solvers/admm_banded.py``) exploits the
horizon structure so well that each XLA iteration is launch-overhead bound,
not bandwidth bound — ~2 * N sequential block-sweep steps of ~2.5 us each,
while the bytes they stream would take ~2 us total (docs/PERFORMANCE.md,
"Next steps").  This kernel runs the WHOLE rho-constant ADMM chunk (up to
``interval`` iterations with per-scenario termination checks) inside one
Pallas program, with every array laid out batch-LAST:

    blocks  (N, w, w, B)    vectors  (N, w, B)

so each per-stage op is a ``(w, B)`` vector op with the large scenario batch
filling the 128-wide lanes and the tiny block width ``w`` (5..16) in
sublanes.  A vmap-of-kernel layout (grid-per-scenario) would instead put
``w`` in lanes and waste (128 - w)/128 of the machine — the reason this
needs a batch-native driver (``solvers/admm_banded_batch.py``) rather than
``jax.vmap`` over the per-scenario solver.

There is no MXU use at all: every "matmul" here is a block-sized
broadcast-multiply-reduce on the VPU (w^2 * B flops per stage), which at
w <= 16 beats shuffling operands into 128x128 systolic tiles.

Algorithm per iteration (identical to ``admm_solve_banded``'s ``one_iter``):
over-relaxed OSQP ADMM with per-row rho; x-update via the block-Thomas
LDL^T sweeps over the precomputed factors; per-scenario OSQP termination on
unscaled residuals every ``check_every`` iterations, with converged
scenarios frozen at check-block granularity (exactly the semantics of
``jax.vmap`` over a per-scenario ``lax.while_loop``).  Scenarios enter with
their own iteration counts (``it0``) so the driver's adaptive-rho chunking
preserves per-scenario ``max_iter`` semantics.

The reference's analog of this layer is OSQP's CUDA algebra backend driven
through CuCaQP (``sqp_solver/CuCaQP.cpp``, ``cuda_install.sh:38``) — a
generic sparse solver that never sees the stage structure.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["banded_admm_chunk"]


def _kernel(
    # inputs (VMEM, one batch tile of size Bt in the last dim)
    it0_ref,  # (1, Bt) int32 per-scenario iteration counts at entry
    done0_ref,  # (1, Bt) int32 1 = frozen (converged / certified) at entry
    hb_ref,  # (N, w, w, Bt) scaled Hessian blocks (P)
    j0_ref,  # (Nd, r, w, Bt) scaled dynamics Jacobian wrt frame k
    j1_ref,  # (Nd, r, w, Bt) scaled dynamics Jacobian wrt frame k+1
    jc_ref,  # (N, r2, w, Bt) scaled stage-constraint Jacobians
    q_ref,  # (N, w, Bt) scaled linear term
    lx_ref,  # (N, w, Bt) bounds / rho, x rows
    ux_ref,
    rx_ref,
    ld_ref,  # (Nd, r, Bt) bounds / rho, dynamics rows
    ud_ref,
    rd_ref,
    lc_ref,  # (N, r2, Bt) bounds / rho, stage-constraint rows
    uc_ref,
    rc_ref,
    ds_ref,  # (N, w, Bt) 1/D variable inverse scaling
    ex_ref,  # (N, w, Bt) 1/E, x rows
    ed_ref,  # (Nd, r, Bt) 1/E, dynamics rows
    ec_ref,  # (N, r2, Bt) 1/E, stage-constraint rows
    ci_ref,  # (1, Bt) 1/c cost inverse scaling
    x0_ref,  # (N, w, Bt) scaled primal warm start
    yx0_ref,  # (N, w, Bt) scaled dual warm start, x rows
    yd0_ref,  # (Nd, r, Bt)
    yc0_ref,  # (N, r2, Bt)
    zx0_ref,  # (N, w, Bt) carried z (driver inits clip(Ax0) on first chunk)
    zd0_ref,  # (Nd, r, Bt)
    zc0_ref,  # (N, r2, Bt)
    # outputs
    xo_ref,  # (N, w, Bt)
    yxo_ref,  # (N, w, Bt)
    ydo_ref,  # (Nd, r, Bt)
    yco_ref,  # (N, r2, Bt)
    zxo_ref,  # (N, w, Bt)
    zdo_ref,  # (Nd, r, Bt)
    zco_ref,  # (N, r2, Bt)
    done_o_ref,  # (1, Bt) int32
    it_o_ref,  # (1, Bt) int32 iterations advanced this chunk
    rp_o_ref,  # (1, Bt) unscaled primal residual at last check (inf if none)
    rd_o_ref,  # (1, Bt) unscaled dual residual
    mp_o_ref,  # (1, Bt) max_prim (for the driver's adaptive rho)
    md_o_ref,  # (1, Bt) max_dual
    # scratch
    s_ref,  # (N, w, Bt) block-sweep workspace
    dinv_ref,  # (N, w, w, Bt) M diag blocks, overwritten by pivot inverses
    g_ref,  # (N-1, w, w, Bt) M subdiag blocks, overwritten by multipliers
    lowt_ref,  # (N-1, w, w, Bt) subdiag transposes (for the Schur products)
    *,
    interval: int,
    check_every: int,
    max_iter: int,
    sigma: float,
    alpha: float,
    eps_abs: float,
    eps_rel: float,
):
    N = q_ref.shape[0]
    w = q_ref.shape[1]

    it0 = it0_ref[:]
    hb = hb_ref[:]
    j0 = j0_ref[:]
    j1 = j1_ref[:]
    jc = jc_ref[:]
    q = q_ref[:]
    lx, ux, rx = lx_ref[:], ux_ref[:], rx_ref[:]
    ld, ud, rd_ = ld_ref[:], ud_ref[:], rd_ref[:]
    lc, uc, rc = lc_ref[:], uc_ref[:], rc_ref[:]
    ds = ds_ref[:]
    ex, ed, ec = ex_ref[:], ed_ref[:], ec_ref[:]
    ci = ci_ref[:]  # (1, Bt)

    # ---- M-build + block-Thomas factorization, in-kernel ---------------
    # M = P + sigma I + A^T R A assembled from the stage blocks and
    # factored here at chunk entry.  As XLA ops this stage is a
    # launch-bound sequential scan over stages (measured at over half the
    # cart-pole tick, docs/PERFORMANCE.md round-3 bisection); in-kernel it
    # is a few hundred chained (w, w, Bt) VPU ops.  Re-entry after a
    # driver rho adaptation refactors automatically.  Every contraction is
    # broadcast-multiply-reduce in the SAME accumulation order as the XLA
    # reference (`_build_M_blocks` / `btd_factor` r-loops) to minimize
    # drift; agreement with `vmap(admm_solve_banded)` is to f32 roundoff,
    # not bitwise — cross-program fusion/FMA formation differs once the
    # factorization lives in a different compiled program (see
    # tests/test_banded_batch.py).
    eye_w = jnp.expand_dims(jnp.eye(w, dtype=hb.dtype), -1)  # (w, w, 1)
    eye_w4 = jnp.expand_dims(eye_w, 0)  # (1, w, w, 1)

    def row_r(rho_s, ja, jb, a):
        """Row a of sum_r rho[.,r] * ja[.,r,a] * jb[.,r,b] -> (., 1, w, Bt).

        Static slices + expand_dims only: Mosaic has no >2D gather, and
        jnp's mixed slice/newaxis indexing lowers through one.  Per
        element the accumulation is a fixed chain of adds over r in
        ascending order — bitwise identical to the XLA reference's
        `_build_M_blocks` loop regardless of layout (a reduction op's
        association order would differ between the two).
        """
        acc = None
        for i in range(ja.shape[1]):
            rho_i = jnp.expand_dims(rho_s[:, i : i + 1, :], 2)
            t = (rho_i * ja[:, i : i + 1, a : a + 1, :]) * jb[
                :, i : i + 1, :, :
            ]
            acc = t if acc is None else acc + t
        return acc

    def row_r_t(rho_s, ja, jb, b):
        """Row b of the TRANSPOSED product: out[., b, a] with each element
        the bitwise-identical product pair (commutative mul), so stacking
        these rows gives low^T exactly without a (leading, sublane)
        transpose, which Mosaic would have to relayout."""
        acc = None
        for i in range(ja.shape[1]):
            rho_i = jnp.expand_dims(rho_s[:, i : i + 1, :], 2)
            t = jb[:, i : i + 1, b : b + 1, :] * (
                rho_i * ja[:, i : i + 1, :, :]
            )
            acc = t if acc is None else acc + t
        return acc

    # Assemble M row-by-row DIRECTLY into the scratch refs: whole-horizon
    # intermediates ((N, w, w, Bt) values for d_lo/d_hi/low/lowT and their
    # transients) are what blew quadrotor h100 past VMEM (Mosaic reported
    # 116 MB of register spills); with per-row accumulate-into-scratch the
    # peak transient is ONE (N, 1, w, Bt) row.  Per-element arithmetic
    # order is unchanged: base, then the J0 term, then J1, then the
    # stage-constraint term, each row's r-chain ascending.
    rx4 = jnp.expand_dims(rx, 2)  # (N, w, 1, Bt)
    dinv_ref[:] = hb + sigma * eye_w4 + eye_w4 * rx4  # diag base
    nd_ = N - 1
    for a in range(w):
        dinv_ref[:nd_, a : a + 1, :, :] = (
            dinv_ref[:nd_, a : a + 1, :, :] + row_r(rd_, j0, j0, a)
        )
    for a in range(w):
        dinv_ref[1:, a : a + 1, :, :] = (
            dinv_ref[1:, a : a + 1, :, :] + row_r(rd_, j1, j1, a)
        )
    for a in range(w):
        dinv_ref[:, a : a + 1, :, :] = (
            dinv_ref[:, a : a + 1, :, :] + row_r(rc, jc, jc, a)
        )
    for a in range(w):
        g_ref[:, a : a + 1, :, :] = row_r(rd_, j1, j0, a)  # low blocks
    for b in range(w):
        lowt_ref[:, b : b + 1, :, :] = row_r_t(rd_, j1, j0, b)

    def spd_inv_bl(m):
        """Unrolled Gauss-Jordan for one (w, w, Bt) SPD block — the
        batch-last twin of ops/block_tridiag.small_spd_inv (identical
        elementwise op order, so the two bit-match)."""
        eye2 = eye_w  # (w, w, 1)
        inv = jnp.broadcast_to(eye2, m.shape).astype(m.dtype)
        for k in range(w):
            piv = m[k : k + 1, k : k + 1, :]  # (1, 1, Bt)
            mrow = m[k : k + 1, :, :] / piv  # (1, w, Bt)
            irow = inv[k : k + 1, :, :] / piv
            col = m[:, k : k + 1, :] * (1.0 - eye2[:, k : k + 1, :])
            m = m - col * mrow
            inv = inv - col * irow
            rowmask = eye_w[:, k : k + 1, :]  # (w, 1, 1): selects row k
            m = m * (1.0 - rowmask) + rowmask * mrow
            inv = inv * (1.0 - rowmask) + rowmask * irow
        return inv

    def mm(a, b):
        """(w, w, Bt) block product sum_j a[i,j] b[j,l] — sequential adds
        (same association order as the XLA reference, see outer_r)."""
        acc = None
        for j in range(w):
            t = a[:, j : j + 1, :] * b[j : j + 1, :, :]
            acc = t if acc is None else acc + t
        return acc

    # Block-Thomas factor in place: dinv_ref holds diag -> pivot inverses,
    # g_ref holds low -> multipliers (stage k-1's low is read before its
    # overwrite).
    dinv_ref[0] = spd_inv_bl(dinv_ref[0])
    for k in range(1, N):
        a_km1 = g_ref[k - 1]
        g_k = mm(a_km1, dinv_ref[k - 1])
        # g_k @ low[k-1]^T via mm against the elementwise-transposed lowT.
        schur = dinv_ref[k] - mm(g_k, lowt_ref[k - 1])
        dinv_ref[k] = spd_inv_bl(schur)
        g_ref[k - 1] = g_k
    dinv = dinv_ref[:]
    g = g_ref[:]

    def mat_A(x):
        """A @ x from stage blocks; x (N, w, Bt) -> section results."""
        x_lo = jnp.expand_dims(x[:-1], 1)  # (Nd, 1, w, Bt)
        x_hi = jnp.expand_dims(x[1:], 1)
        ax_d = jnp.sum(j0 * x_lo, axis=2) + jnp.sum(j1 * x_hi, axis=2)
        ax_c = jnp.sum(jc * jnp.expand_dims(x, 1), axis=2)
        return x, ax_d, ax_c

    def mat_AT(tx, td, tc):
        """A^T @ t; sections -> (N, w, Bt)."""
        td_e = jnp.expand_dims(td, 2)  # (Nd, r, 1, Bt)
        c0 = jnp.sum(j0 * td_e, axis=1)  # (Nd, w, Bt)
        c1 = jnp.sum(j1 * td_e, axis=1)
        zrow = jnp.zeros((1,) + c0.shape[1:], c0.dtype)
        out = tx + jnp.concatenate([c0, zrow], axis=0)
        out = out + jnp.concatenate([zrow, c1], axis=0)
        return out + jnp.sum(jc * jnp.expand_dims(tc, 2), axis=1)

    def mat_P(x):
        return jnp.sum(hb * jnp.expand_dims(x, 1), axis=2)

    def btd_solve(rhs):
        """Block-Thomas solve M x = rhs using (dinv, g); rhs (N, w, Bt).

        Python loops over the (static) stage count keep every block index
        constant — dynamic indexing into kernel VALUES would lower to >2D
        gathers, which Mosaic does not support.
        """
        ex0 = lambda a: jnp.expand_dims(a, 0)  # (w, Bt) -> (1, w, Bt)
        s_ref[0] = rhs[0]
        for k in range(1, N):
            s_ref[k] = rhs[k] - jnp.sum(g[k - 1] * ex0(s_ref[k - 1]), axis=1)
        s_ref[N - 1] = jnp.sum(dinv[N - 1] * ex0(s_ref[N - 1]), axis=1)
        for k in range(N - 2, -1, -1):
            x_next = jnp.expand_dims(s_ref[k + 1], 1)  # (w, 1, Bt)
            s_ref[k] = jnp.sum(dinv[k] * ex0(s_ref[k]), axis=1) - jnp.sum(
                g[k] * x_next, axis=0
            )
        return s_ref[:]

    def one_iter(_, c):
        x, zx, zd, zc, yx, yd, yc = c
        rhs = sigma * x - q + mat_AT(rx * zx - yx, rd_ * zd - yd, rc * zc - yc)
        xt = btd_solve(rhs)
        ax, ad, ac = mat_A(xt)
        x_n = alpha * xt + (1.0 - alpha) * x

        def relax(zt, z, y, rho, lo, hi):
            z_rel = alpha * zt + (1.0 - alpha) * z
            z_new = jnp.clip(z_rel + y / rho, lo, hi)
            y_new = y + rho * (z_rel - z_new)
            return z_new, y_new

        zx_n, yx_n = relax(ax, zx, yx, rx, lx, ux)
        zd_n, yd_n = relax(ad, zd, yd, rd_, ld, ud)
        zc_n, yc_n = relax(ac, zc, yc, rc, lc, uc)
        return (x_n, zx_n, zd_n, zc_n, yx_n, yd_n, yc_n)

    def maxsec(a):
        """max over all but the batch axis -> (1, Bt)."""
        return jnp.max(a, axis=tuple(range(a.ndim - 1)))[None, :]

    def residuals(x, zx, zd, zc, yx, yd, yc):
        ax, ad, ac = mat_A(x)
        px = mat_P(x)
        aty = mat_AT(yx, yd, yc)
        r_prim = jnp.maximum(
            jnp.maximum(
                maxsec(jnp.abs((ax - zx) * ex)), maxsec(jnp.abs((ad - zd) * ed))
            ),
            maxsec(jnp.abs((ac - zc) * ec)),
        )
        r_dual = ci * maxsec(jnp.abs((px + q + aty) * ds))
        max_ax = jnp.maximum(
            jnp.maximum(maxsec(jnp.abs(ax * ex)), maxsec(jnp.abs(ad * ed))),
            maxsec(jnp.abs(ac * ec)),
        )
        max_z = jnp.maximum(
            jnp.maximum(maxsec(jnp.abs(zx * ex)), maxsec(jnp.abs(zd * ed))),
            maxsec(jnp.abs(zc * ec)),
        )
        max_prim = jnp.maximum(max_ax, max_z)
        max_dual = ci * jnp.maximum(
            jnp.maximum(maxsec(jnp.abs(aty * ds)), maxsec(jnp.abs(px * ds))),
            maxsec(jnp.abs(q * ds)),
        )
        return r_prim, r_dual, max_prim, max_dual

    x = x0_ref[:]
    yx, yd, yc = yx0_ref[:], yd0_ref[:], yc0_ref[:]
    # z is CARRIED across chunks (exactly like admm_solve_banded's while
    # state) — the driver initializes it to clip(A x0, l, u) once before
    # the first chunk, so multi-chunk solves and rho adaptations see the
    # same z trajectory as the per-scenario reference.
    zx, zd, zc = zx0_ref[:], zd0_ref[:], zc0_ref[:]
    done = done0_ref[:]
    inf_row = jnp.full((1, x.shape[-1]), jnp.inf, x.dtype)
    it_inc = jnp.zeros((1, x.shape[-1]), jnp.int32)

    def active(done, k):
        return jnp.logical_and(done == 0, it0 + k < max_iter)

    def cond(state):
        k = state[0]
        done = state[8]
        return jnp.logical_and(k < interval, jnp.any(active(done, k)))

    def body(state):
        k, x, zx, zd, zc, yx, yd, yc, done, it_inc, rp, rd, mp, md = state
        act = active(done, k)  # (1, Bt) bool
        new = jax.lax.fori_loop(
            0, check_every, one_iter, (x, zx, zd, zc, yx, yd, yc)
        )

        def sel(a, b):
            return jnp.where(act[None], a, b)

        x = sel(new[0], x)
        zx, zd, zc = sel(new[1], zx), sel(new[2], zd), sel(new[3], zc)
        yx, yd, yc = sel(new[4], yx), sel(new[5], yd), sel(new[6], yc)
        r_prim, r_dual, max_prim, max_dual = residuals(
            x, zx, zd, zc, yx, yd, yc
        )
        eps_pri = eps_abs + eps_rel * max_prim
        eps_dua = eps_abs + eps_rel * max_dual
        newly = jnp.logical_and(
            act, jnp.logical_and(r_prim <= eps_pri, r_dual <= eps_dua)
        )
        it_inc = jnp.where(act, it_inc + check_every, it_inc)
        rp = jnp.where(act, r_prim, rp)
        rd = jnp.where(act, r_dual, rd)
        mp = jnp.where(act, max_prim, mp)
        md = jnp.where(act, max_dual, md)
        done = jnp.where(newly, 1, done)
        return (k + check_every, x, zx, zd, zc, yx, yd, yc, done,
                it_inc, rp, rd, mp, md)

    state = (
        jnp.int32(0), x, zx, zd, zc, yx, yd, yc, done,
        it_inc, inf_row, inf_row, inf_row, inf_row,
    )
    (_, x, zx, zd, zc, yx, yd, yc, done, it_inc, rp, rd, mp, md) = (
        jax.lax.while_loop(cond, body, state)
    )

    xo_ref[:] = x
    yxo_ref[:], ydo_ref[:], yco_ref[:] = yx, yd, yc
    zxo_ref[:], zdo_ref[:], zco_ref[:] = zx, zd, zc
    done_o_ref[:] = done
    it_o_ref[:] = it_inc
    rp_o_ref[:], rd_o_ref[:] = rp, rd
    mp_o_ref[:], md_o_ref[:] = mp, md


@partial(
    jax.jit,
    static_argnames=(
        "interval", "check_every", "max_iter",
        "sigma", "alpha", "eps_abs", "eps_rel",
        "batch_tile", "interpret",
    ),
)
def banded_admm_chunk(
    it0,  # (B,) int32
    done0,  # (B,) int32 (converged / certified / frozen at entry)
    HbT,  # (N, w, w, B)
    J0T,  # (Nd, r, w, B)
    J1T,  # (Nd, r, w, B)
    JcT,  # (N, r2, w, B)
    qT,  # (N, w, B)
    boundsT,  # dict of section arrays: lx ux rx ld ud rd lc uc rc
    scaleT,  # dict: ds ex ed ec ci
    xT,  # (N, w, B)
    yxT,
    ydT,
    ycT,
    zxT,  # carried z sections (clip(A x0) before the first chunk)
    zdT,
    zcT,
    *,
    interval: int,
    check_every: int,
    max_iter: int,
    sigma: float,
    alpha: float,
    eps_abs: float,
    eps_rel: float,
    batch_tile: int,
    interpret: bool = False,
):
    """Run one rho-constant banded-ADMM chunk; all arrays batch-last.

    The kernel assembles ``M = P + sigma I + A^T R A`` from the stage
    blocks and block-Thomas-factors it at entry (scratch-resident), so the
    driver passes operators + rho only — no factorization in XLA, and a
    rho adaptation refactors simply by re-entering.

    Returns ``(x, yx, yd, yc, zx, zd, zc, done, it_inc, rp, rd, mp, md)``
    with the same layouts (scalars per scenario as (B,) rows).  The grid
    splits the batch into tiles of ``batch_tile`` scenarios; each program
    owns one tile's operators in VMEM for the whole chunk.
    """
    B = xT.shape[-1]
    if B % batch_tile:
        raise ValueError(f"batch {B} not divisible by tile {batch_tile}")
    grid = (B // batch_tile,)
    dtype = xT.dtype

    def spec(a):
        blk = a.shape[:-1] + (batch_tile,)
        nl = a.ndim - 1
        # Single-buffer every block: the default revolving double buffer
        # exists to overlap the next grid step's DMA-in with compute, but
        # one chunk program computes for ~milliseconds while its whole
        # working set streams in microseconds — the overlap is worthless
        # and the 2x VMEM cost is what kept unicycle h50 off this kernel
        # (see solvers/admm_banded_batch.pick_batch_tile).
        return pl.BlockSpec(
            blk,
            lambda i, nl=nl: (0,) * nl + (i,),
            pipeline_mode=pl.Buffered(buffer_count=1),
        )

    inputs = [
        it0[None, :].astype(jnp.int32),
        done0[None, :].astype(jnp.int32),
        HbT, J0T, J1T, JcT, qT,
        boundsT["lx"], boundsT["ux"], boundsT["rx"],
        boundsT["ld"], boundsT["ud"], boundsT["rd"],
        boundsT["lc"], boundsT["uc"], boundsT["rc"],
        scaleT["ds"], scaleT["ex"], scaleT["ed"], scaleT["ec"],
        scaleT["ci"][None, :],
        xT, yxT, ydT, ycT, zxT, zdT, zcT,
    ]
    out_shapes = (
        jax.ShapeDtypeStruct(xT.shape, dtype),  # x
        jax.ShapeDtypeStruct(yxT.shape, dtype),
        jax.ShapeDtypeStruct(ydT.shape, dtype),
        jax.ShapeDtypeStruct(ycT.shape, dtype),
        jax.ShapeDtypeStruct(yxT.shape, dtype),  # zx
        jax.ShapeDtypeStruct(ydT.shape, dtype),
        jax.ShapeDtypeStruct(ycT.shape, dtype),
        jax.ShapeDtypeStruct((1, B), jnp.int32),  # done
        jax.ShapeDtypeStruct((1, B), jnp.int32),  # it_inc
        jax.ShapeDtypeStruct((1, B), dtype),  # rp
        jax.ShapeDtypeStruct((1, B), dtype),  # rd
        jax.ShapeDtypeStruct((1, B), dtype),  # mp
        jax.ShapeDtypeStruct((1, B), dtype),  # md
    )
    kernel = partial(
        _kernel,
        interval=interval,
        check_every=check_every,
        max_iter=max_iter,
        sigma=sigma,
        alpha=alpha,
        eps_abs=eps_abs,
        eps_rel=eps_rel,
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=out_shapes,
        in_specs=[spec(a) for a in inputs],
        out_specs=tuple(spec(jax.ShapeDtypeStruct(s.shape, s.dtype))
                        for s in out_shapes),
        scratch_shapes=[
            pltpu.VMEM(xT.shape[:-1] + (batch_tile,), dtype),  # sweep ws
            # M diag / subdiag blocks, overwritten in place by the
            # block-Thomas factors (dinv / g) during the entry prologue,
            # plus the subdiag transposes for the Schur products.
            pltpu.VMEM(HbT.shape[:-1] + (batch_tile,), dtype),
            pltpu.VMEM((HbT.shape[0] - 1,) + HbT.shape[1:-1] + (batch_tile,), dtype),
            pltpu.VMEM((HbT.shape[0] - 1,) + HbT.shape[1:-1] + (batch_tile,), dtype),
        ],
        # v5e has ~128 MB of physical VMEM (probed empirically: 126 MB
        # scratch compiles AND runs); the 16 MB default is only XLA's
        # scoped-vmem guard for fused ops.  Raising it here lets one grid
        # program own quadrotor-h100-sized operator sets on-chip.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*inputs)
    (x, yx, yd, yc, zx, zd, zc, done, it_inc, rp, rd, mp, md) = outs
    return (
        x, yx, yd, yc, zx, zd, zc,
        done[0], it_inc[0], rp[0], rd[0], mp[0], md[0],
    )
