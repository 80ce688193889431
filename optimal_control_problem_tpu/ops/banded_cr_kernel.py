"""Pallas TPU kernel: banded ADMM chunk with CYCLIC-REDUCTION solves.

Same driver contract, layouts, and per-iteration ADMM semantics as
:mod:`.banded_rolled_kernel`, but the block-tridiagonal x-update runs as
block odd-even cyclic reduction instead of the block-Thomas sweeps:

* **why**: Thomas is ~2N sequential block steps per ADMM iteration — at
  quadrotor h100 that is ~200 dependent (w, B) ops, measured ~60 us per
  iteration regardless of batch (the VPU idles on the dependency chain;
  partial unrolling measured neutral).  CR eliminates all odd stages of a
  level simultaneously, so the sequential depth is ~2 log2(N) whole-array
  levels (7 for N=100) at ~1.5x the flops — each level op covers the
  whole surviving stage set at once, which is exactly what the VPU wants;
* **factorization** too: the per-level odd-pivot inverses are ONE
  whole-array Gauss-Jordan over all odd stages of the level, instead of N
  sequential Schur/invert steps;
* this is the in-kernel twin of ``ops/block_tridiag.cr_factor/cr_solve``
  (the XLA reference pair behind ``ADMMSettings.banded_solver="cr"``) —
  the driver maps ``banded_solver="cr"`` onto this kernel on the batch
  path.

Mosaic has no >2D gather, so the classic strided odd/even access is
expressed as reshape-based de-interleave (``x.reshape(h, 2, ...)[:, k]``)
and ``jnp.stack`` re-interleave — both probed supported on real TPU, as
is the ``swapaxes(1, 2)`` block transpose the factor products need.
Level arrays live packed in two scratch refs (``dinv`` per-level odd
pivot inverses + root; ``L`` per-level subdiagonals); the factor loop
processes survivor GROUPS (<= 16 blocks) per step so transients stay a
few MB instead of whole-level values.

Reference analog being beaten: one-at-a-time OSQP-CUDA with a generic
sparse LDL that never sees the stage structure
(``sqp_solver/CuCaQP.cpp:271-288``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["banded_admm_chunk_cr", "pick_cr_tile", "cr_level_plan"]


def cr_level_plan(N: int):
    """Static level metadata: list of ``(n, n_p, half, off_d, off_L)``
    plus the root slot index and total L slots.

    ``n``: live stage count entering the level; ``n_p``: padded-to-even;
    ``half``: survivors (= odds eliminated); ``off_d``: this level's
    offset into the packed odd-pivot-inverse array; ``off_L``: offset of
    this level's (padded) subdiagonal array in the packed L buffer.
    """
    levels = []
    off_d = 0
    off_L = 0
    n = N
    while n > 1:
        n_p = n + (n % 2)
        half = n_p // 2
        levels.append((n, n_p, half, off_d, off_L))
        off_d += half
        off_L += n_p
        n = half
    return levels, off_d, off_L


def pick_cr_tile(B: int, N: int, w: int, r: int, r2: int):
    """Batch tile whose CR-kernel working set fits in VMEM, or None."""
    p8 = lambda s: -(-s // 8) * 8
    wp, rp, r2p = p8(w), p8(r), p8(r2)
    nd = N - 1
    _, nd_slots, nl_slots = cr_level_plan(N)
    carry = 3 * N * wp + 2 * nd * rp + 2 * N * r2p
    blocks = N * w * wp
    ins = (
        # (no Hb term: it stays in HBM and is DMA'd through dw)
        2 * nd * r * wp
        + N * r2 * wp
        + N * wp
        + 3 * (N * wp + nd * rp + N * r2p)
        + 2 * N * wp + nd * rp + N * r2p + 8
        + 2 * 8
        + carry
    )
    outs = carry + 6 * 8
    # scratch: sweep rows + working diag + packed dinv + packed L +
    # current-level transposed L
    scratch = (
        N * wp + 2 * blocks + (nd_slots + 1) * w * wp + nl_slots * w * wp
    )
    # live values: 2x carry (the contraction transients are row-sized and
    # the factor is grouped, so no operator-sized value stays live)
    values = 2 * carry
    bytes_per_lane = 4 * (ins + outs + scratch + values)
    budget = 116 * 1024 * 1024
    lanes = lambda t: -(-t // 128) * 128
    if lanes(max(B, 1)) * bytes_per_lane <= budget:
        return max(B, 1)
    for tile in (512, 384, 256, 128):
        if tile <= B and tile * bytes_per_lane <= budget:
            return tile
    return None


def _kernel(
    it0_ref,  # (1, Bt) int32
    done0_ref,  # (1, Bt) int32
    hb_ref,  # (N, w, w, B) — FULL array in HBM (memory_space=ANY); DMA'd
    #          into dw_ref for assembly and again after the factor for
    #          mat_P, so the 13 MB (at h100) never holds a VMEM slot of
    #          its own
    j0_ref,  # (Nd, r, w, Bt)
    j1_ref,  # (Nd, r, w, Bt)
    jc_ref,  # (N, r2, w, Bt)
    q_ref,  # (N, w, Bt)
    lx_ref, ux_ref, rx_ref,  # (N, w, Bt)
    ld_ref, ud_ref, rd_ref,  # (Nd, r, Bt)
    lc_ref, uc_ref, rc_ref,  # (N, r2, Bt)
    ds_ref,  # (N, w, Bt)
    ex_ref,  # (N, w, Bt)
    ed_ref,  # (Nd, r, Bt)
    ec_ref,  # (N, r2, Bt)
    ci_ref,  # (1, Bt)
    x0_ref, yx0_ref, yd0_ref, yc0_ref, zx0_ref, zd0_ref, zc0_ref,
    # outputs
    xo_ref, yxo_ref, ydo_ref, yco_ref, zxo_ref, zdo_ref, zco_ref,
    done_o_ref, it_o_ref, rp_o_ref, rd_o_ref, mp_o_ref, md_o_ref,
    # scratch
    s_ref,  # (N(+1), w, Bt) rhs/solution workspace, front-packed per level
    s2_ref,  # (nd_slots, w, Bt) folded odd rhs, packed at the dinv offsets
    dw_ref,  # (N(+1), w, w, Bt) working diagonals, shrinking per level
    dinv_ref,  # (nd_slots + 1, w, w, Bt) packed odd-pivot inverses + root
    L_ref,  # (nl_slots, w, w, Bt) packed per-level subdiagonals
    lt_ref,  # (N(+1), w, w, Bt) CURRENT level's transposed L (front-packed)
    hb_sem,  # DMA semaphore for the Hb copies
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
    nd_ = N - 1
    dtype = q_ref.dtype
    Bt = q_ref.shape[-1]
    levels, root_slot, _ = cr_level_plan(N)

    it0 = it0_ref[:]
    ci = ci_ref[:]  # (1, Bt)

    eye_w = jnp.expand_dims(jnp.eye(w, dtype=dtype), -1)  # (w, w, 1)
    eye_w4 = jnp.expand_dims(eye_w, 0)  # (1, w, w, 1)

    # ---- block helpers (batch-last) ------------------------------------
    # Mosaic-safety rules, established by bisection on real TPU (w = 16):
    # COLUMN-shaped intermediates (untiled = w, sublane = 1), sublane-axis
    # concats, and swapaxes block transposes all crash the compiler
    # (``Check failed: limits[i] <= dim(i)``).  Everything below sticks to
    # PROVEN patterns: scalar-slice x row-slice products accumulated and
    # concatenated along UNTILED axes, axis-2 (sublane) reductions, and
    # reshape-based de-interleave.  Block transposes are never computed —
    # the factor keeps an explicitly-assembled transposed-L workspace.
    def bmm(a, b):
        """(m, w, w, Bt) @ (m, w, w, Bt): w column x row broadcast terms
        (the col x row MULTIPLY broadcast is a proven-safe pattern — the
        crashes were thin columns meeting FULL-shaped operands in binary
        ops, and sublane-axis concats)."""
        acc = None
        for j in range(w):
            t = a[:, :, j : j + 1, :] * b[:, j : j + 1, :, :]
            acc = t if acc is None else acc + t
        return acc

    def bmv(a, v):
        """(m, w, w, Bt) @ (m, w, Bt) -> (m, w, Bt): row-dot via an
        axis-2 (sublane) reduction per output row."""
        ve = jnp.expand_dims(v, 1)  # (m, 1, w, Bt)
        rows = [
            jnp.sum(a[:, i : i + 1, :, :] * ve, axis=2)  # (m, 1, Bt)
            for i in range(w)
        ]
        return jnp.concatenate(rows, axis=1)

    def bmv_t(a, v):
        """a^T @ v: sum of scalar x row, then drop the unit row axis."""
        acc = None
        for i in range(w):
            vi = jnp.expand_dims(v[:, i : i + 1, :], 2)  # (m, 1, 1, Bt)
            t = vi * a[:, i : i + 1, :, :]
            acc = t if acc is None else acc + t
        return acc.reshape(acc.shape[0], w, acc.shape[-1])

    def spd_inv_arr(m):
        """Whole-array Gauss-Jordan over (m_cnt, w, w, Bt) SPD blocks."""
        inv = jnp.broadcast_to(eye_w4, m.shape).astype(m.dtype)
        for k in range(w):
            piv = m[:, k : k + 1, k : k + 1, :]
            mrow = m[:, k : k + 1, :, :] / piv
            irow = inv[:, k : k + 1, :, :] / piv
            col = m[:, :, k : k + 1, :] * (1.0 - eye_w4[:, :, k : k + 1, :])
            m = m - col * mrow
            inv = inv - col * irow
            rowmask = eye_w4[:, :, k : k + 1, :]
            m = m * (1.0 - rowmask) + rowmask * mrow
            inv = inv * (1.0 - rowmask) + rowmask * irow
        return inv

    # ---- M assembly (identical to banded_rolled_kernel, plus L layout) -
    def row_r(rho_ref_, ja_ref, jb_ref, a, lo=0, hi=None):
        acc = None
        for i in range(ja_ref.shape[1]):
            rho_i = jnp.expand_dims(rho_ref_[lo:hi, i : i + 1, :], 2)
            t = (rho_i * ja_ref[lo:hi, i : i + 1, a : a + 1, :]) * jb_ref[
                lo:hi, i : i + 1, :, :
            ]
            acc = t if acc is None else acc + t
        return acc

    # (dw_ref may carry one extra pad slot for odd horizons; assembly
    # touches the N real stages only.)
    Bt = q_ref.shape[-1]

    def dma_hb_into_dw():
        if hb_ref.shape[-1] == Bt:
            # Single-tile grid: whole-array copy (a lane slice narrower
            # than the 128-lane tiling is rejected by Mosaic; tiles from
            # pick_cr_tile are otherwise 128-multiples, so the sliced
            # path below stays aligned).
            src = hb_ref
        else:
            i = pl.program_id(0)
            src = hb_ref.at[:, :, :, pl.ds(i * Bt, Bt)]
        cp = pltpu.make_async_copy(src, dw_ref.at[0:N], hb_sem)
        cp.start()
        cp.wait()

    dma_hb_into_dw()
    for a in range(w):
        dw_ref[0:N, a : a + 1, a : a + 1, :] = dw_ref[
            0:N, a : a + 1, a : a + 1, :
        ] + (sigma + jnp.expand_dims(rx_ref[:, a : a + 1, :], 2))
    for a in range(w):
        dw_ref[:nd_, a : a + 1, :, :] = (
            dw_ref[:nd_, a : a + 1, :, :] + row_r(rd_ref, j0_ref, j0_ref, a)
        )
    for a in range(w):
        dw_ref[1:N, a : a + 1, :, :] = (
            dw_ref[1:N, a : a + 1, :, :] + row_r(rd_ref, j1_ref, j1_ref, a)
        )
    for a in range(w):
        dw_ref[0:N, a : a + 1, :, :] = (
            dw_ref[0:N, a : a + 1, :, :] + row_r(rc_ref, jc_ref, jc_ref, a)
        )
    # Level-0 L: L[k] couples stage k to k-1 (L[0] = 0) — the low blocks.
    # The transposed workspace LT mirrors the CURRENT level's L only
    # (front-packed, consumed by the factor; the solve never needs it) —
    # level 0 is assembled directly from the J-blocks with the commutative
    # row_r_t product pairs (no block transpose op exists on this TPU
    # path; see the Mosaic-safety note above).
    def row_r_t(rho_ref_, ja_ref, jb_ref, b):
        acc = None
        for i in range(ja_ref.shape[1]):
            rho_i = jnp.expand_dims(rho_ref_[:, i : i + 1, :], 2)
            t = jb_ref[:, i : i + 1, b : b + 1, :] * (
                rho_i * ja_ref[:, i : i + 1, :, :]
            )
            acc = t if acc is None else acc + t
        return acc

    zero_b1 = jnp.zeros((1, w, w, Bt), dtype)
    L_ref[0:1] = zero_b1
    lt_ref[0:1] = zero_b1
    for a in range(w):
        L_ref[1:N, a : a + 1, :, :] = row_r(rd_ref, j1_ref, j0_ref, a)
    for b in range(w):
        lt_ref[1:N, b : b + 1, :, :] = row_r_t(rd_ref, j1_ref, j0_ref, b)
    n_p0 = levels[0][1]
    if n_p0 != N:
        L_ref[N : n_p0] = jnp.zeros((n_p0 - N, w, w, Bt), dtype)
        lt_ref[N : n_p0] = jnp.zeros((n_p0 - N, w, w, Bt), dtype)

    # ---- CR factorization: per level, grouped over survivors -----------
    GROUP = 16

    for li, (n, n_p, half, off_d, off_L) in enumerate(levels):
        pad = n_p != n
        if pad:
            # Pad stage: identity diagonal, zero coupling (harmless odd).
            dw_ref[n : n + 1] = jnp.broadcast_to(
                eye_w4, (1, w, w, Bt)
            ).astype(dtype)
            L_ref[off_L + n : off_L + n_p] = jnp.zeros(
                (n_p - n, w, w, Bt), dtype
            )
            lt_ref[n : n_p] = jnp.zeros((n_p - n, w, w, Bt), dtype)
        # Next-level L geometry (written per group below).
        if half > 1:
            off_L2 = off_L + n_p
            n_p2 = half + (half % 2)
        def fact_group(g0, gc, is_first):
            """One survivor group; ``g0`` may be a TRACED offset (the
            middle full-size groups run under a fori_loop so the spill
            slots of one body are shared — the unrolled form was ~111 MB
            of Mosaic register spills at h100), ``gc``/``is_first`` are
            static."""
            d_g = dw_ref[pl.ds(2 * g0, 2 * gc)].reshape(gc, 2, w, w, Bt)
            d_even, d_odd = d_g[:, 0], d_g[:, 1]
            L_g = L_ref[pl.ds(off_L + 2 * g0, 2 * gc)].reshape(
                gc, 2, w, w, Bt
            )
            L_lo, L_odd = L_g[:, 0], L_g[:, 1]
            LT_g = lt_ref[pl.ds(2 * g0, 2 * gc)].reshape(gc, 2, w, w, Bt)
            LT_lo, LT_odd = LT_g[:, 0], LT_g[:, 1]
            dinv_odd = spd_inv_arr(d_odd)
            dinv_ref[pl.ds(off_d + g0, gc)] = dinv_odd
            # dinv of the odd BELOW each survivor: shifted by one; the
            # first survivor of this group needs the previous group's
            # last odd inverse (read back from the packed ref).
            if is_first:
                # Runtime zero (a CONSTANT zero block feeding the bmm
                # chain crashes the Mosaic compiler — bisected:
                # ``Check failed: limits[i] <= dim(i)`` from const
                # folding; dinv_ref[off_d] was just written above).
                prev = dinv_ref[off_d : off_d + 1] * 0.0
            else:
                prev = dinv_ref[pl.ds(off_d + g0 - 1, 1)]
            # (gc can be 1 at the deepest levels; Mosaic rejects the
            # zero-size slice a blind [:-1] concat would create.)
            if gc > 1:
                dinv_lo = jnp.concatenate([prev, dinv_odd[:-1]], axis=0)
            else:
                dinv_lo = prev
            G_lo = bmm(L_lo, dinv_lo)
            # new_d = d_even - L_lo Dlo L_lo^T - L_odd^T Dodd L_odd,
            # every product in natural orientation against the stored
            # transposes.
            new_d = (
                d_even
                - bmm(G_lo, LT_lo)
                - bmm(bmm(LT_odd, dinv_odd), L_odd)
            )
            dw_ref[pl.ds(g0, gc)] = new_d
            if half > 1:
                # Next-level L rows i: L'[i] = -G_lo[i] @ L_odd[i-1]; the
                # transpose L'^T[i] = -LT_odd[i-1] @ G_lo^T[i] with
                # G_lo^T = dinv_lo @ LT_lo (dinv symmetric).
                G_loT = bmm(dinv_lo, LT_lo)
                if is_first:
                    L_ref[off_L2 : off_L2 + 1] = zero_b1
                    lt_ref[0:1] = zero_b1
                    if gc > 1:
                        L_ref[off_L2 + 1 : off_L2 + gc] = -bmm(
                            G_lo[1:], L_odd[:-1]
                        )
                        lt_ref[1:gc] = -bmm(LT_odd[:-1], G_loT[1:])
                else:
                    lo_prev = L_ref[
                        pl.ds(off_L + 2 * g0 - 1, 1)
                    ]  # L_odd of previous group's last survivor
                    lt_prev = lt_ref[pl.ds(2 * g0 - 1, 1)]
                    if gc > 1:
                        L_odd_sh = jnp.concatenate(
                            [lo_prev, L_odd[:-1]], axis=0
                        )
                        LT_odd_sh = jnp.concatenate(
                            [lt_prev, LT_odd[:-1]], axis=0
                        )
                    else:
                        L_odd_sh = lo_prev
                        LT_odd_sh = lt_prev
                    L_ref[pl.ds(off_L2 + g0, gc)] = -bmm(G_lo, L_odd_sh)
                    lt_ref[pl.ds(g0, gc)] = -bmm(LT_odd_sh, G_loT)

        first = min(GROUP, half)
        fact_group(0, first, True)
        full = half // GROUP
        rem = half % GROUP
        if full > 1:
            jax.lax.fori_loop(
                1, full, lambda g, _: (fact_group(g * GROUP, GROUP, False), 0)[1], 0
            )
        if full >= 1 and rem > 0:
            fact_group(full * GROUP, rem, False)
        if half > 1 and n_p2 != half:
            L_ref[off_L2 + half : off_L2 + n_p2] = jnp.zeros(
                (n_p2 - half, w, w, Bt), dtype
            )
            lt_ref[half : n_p2] = jnp.zeros((n_p2 - half, w, w, Bt), dtype)
    dinv_ref[root_slot : root_slot + 1] = spd_inv_arr(
        dw_ref[0:1]
    )
    # The factor is done with dw — refill it with Hb so the residual
    # checks' P-matvec reads on-chip (Hb itself never occupies VMEM).
    dma_hb_into_dw()

    # ---- operator applications (same as banded_rolled_kernel) ----------
    def _contract_w(j_ref, xs):
        acc = None
        for j in range(w):
            t = j_ref[:, :, j, :] * xs[:, j : j + 1, :]
            acc = t if acc is None else acc + t
        return acc

    def _contract_rows(j_ref, t_sec):
        acc = None
        for i in range(j_ref.shape[1]):
            t = j_ref[:, i, :, :] * t_sec[:, i : i + 1, :]
            acc = t if acc is None else acc + t
        return acc

    def mat_A(x):
        ax_d = _contract_w(j0_ref, x[:-1]) + _contract_w(j1_ref, x[1:])
        ax_c = _contract_w(jc_ref, x)
        return x, ax_d, ax_c

    def mat_AT(tx, td, tc):
        c0 = _contract_rows(j0_ref, td)
        c1 = _contract_rows(j1_ref, td)
        zrow = jnp.zeros((1,) + c0.shape[1:], c0.dtype)
        out = tx + jnp.concatenate([c0, zrow], axis=0)
        out = out + jnp.concatenate([zrow, c1], axis=0)
        return out + _contract_rows(jc_ref, tc)

    def mat_P(x):
        # Hb lives in dw_ref[0:N] after the factor (see dma_hb_into_dw).
        acc = None
        for j in range(w):
            t = dw_ref[0:N, :, j, :] * x[:, j : j + 1, :]
            acc = t if acc is None else acc + t
        return acc

    # ---- CR solve: log-depth down/up sweeps ----------------------------
    zero_v1 = jnp.zeros((1, w, Bt), dtype)

    def cr_solve(rhs):
        # The rhs/solution lives in s_ref (front-packed per level) and the
        # folded odd rhs in s2_ref (packed at the dinv offsets); group
        # bodies use dynamic ref offsets so the middle groups run under a
        # fori_loop — one spill footprint per level instead of per group
        # (the unrolled form was the other half of the 111 MB of Mosaic
        # register spills at h100).
        #
        # Runtime zeros only — constant zero blocks in the block-op
        # chains crash the Mosaic compiler (see the factor's `prev`).
        zv = rhs[0:1] * 0.0  # (1, w, Bt)
        zb = L_ref[0:1] * 0.0  # (1, w, w, Bt)
        s_ref[0:N] = rhs
        for (n, n_p, half, off_d, off_L) in levels:
            if n_p != n:
                s_ref[n:n_p] = zv

            def down_group(g0, gc, t_last):
                b_g = s_ref[pl.ds(2 * g0, 2 * gc)].reshape(gc, 2, w, Bt)
                b_even, b_odd = b_g[:, 0], b_g[:, 1]
                dinv_g = dinv_ref[pl.ds(off_d + g0, gc)]
                L_g = L_ref[pl.ds(off_L + 2 * g0, 2 * gc)].reshape(
                    gc, 2, w, w, Bt
                )
                L_lo, L_odd = L_g[:, 0], L_g[:, 1]
                t_odd = bmv(dinv_g, b_odd)
                if gc > 1:
                    t_lo = jnp.concatenate([t_last, t_odd[:-1]], axis=0)
                else:
                    t_lo = t_last
                s2_ref[pl.ds(off_d + g0, gc)] = b_odd
                s_ref[pl.ds(g0, gc)] = (
                    b_even - bmv(L_lo, t_lo) - bmv_t(L_odd, t_odd)
                )
                return t_odd[gc - 1 : gc]

            first = min(GROUP, half)
            t_last = down_group(0, first, zv)
            full = half // GROUP
            rem = half % GROUP
            if full > 1:
                t_last = jax.lax.fori_loop(
                    1, full,
                    lambda g, t: down_group(g * GROUP, GROUP, t),
                    t_last,
                )
            if full >= 1 and rem > 0:
                down_group(full * GROUP, rem, t_last)
        s_ref[0:1] = bmv(
            dinv_ref[root_slot : root_slot + 1], s_ref[0:1]
        )
        for (n, n_p, half, off_d, off_L) in reversed(levels):

            def up_group(g0, gc, is_top):
                # All reads precede the interleaved write; groups run
                # HIGH to LOW so positions [2*g0, 2*g1) are written only
                # after every read at index < 2*g0 is done.
                x_even_g = s_ref[pl.ds(g0, gc)]
                dinv_g = dinv_ref[pl.ds(off_d + g0, gc)]
                L_g = L_ref[pl.ds(off_L + 2 * g0, 2 * gc)].reshape(
                    gc, 2, w, w, Bt
                )
                L_odd = L_g[:, 1]
                if not is_top:
                    x_b = s_ref[pl.ds(g0 + gc, 1)]
                    if gc > 1:
                        x_hi = jnp.concatenate(
                            [x_even_g[1:], x_b], axis=0
                        )
                    else:
                        x_hi = x_b
                    L_next = L_ref[
                        pl.ds(off_L + 2 * g0 + 2, 2 * gc)
                    ].reshape(gc, 2, w, w, Bt)[:, 0]
                elif gc > 1:
                    x_hi = jnp.concatenate([x_even_g[1:], zv], axis=0)
                    L_next = jnp.concatenate(
                        [
                            L_ref[
                                pl.ds(off_L + 2 * g0 + 2, 2 * (gc - 1))
                            ].reshape(gc - 1, 2, w, w, Bt)[:, 0],
                            zb,
                        ],
                        axis=0,
                    )
                else:
                    x_hi = zv
                    L_next = zb
                b_odd = s2_ref[pl.ds(off_d + g0, gc)]
                rhs_o = (
                    b_odd
                    - bmv(L_odd, x_even_g)
                    - bmv_t(L_next, x_hi)
                )
                x_odd = bmv(dinv_g, rhs_o)
                s_ref[pl.ds(2 * g0, 2 * gc)] = jnp.stack(
                    [x_even_g, x_odd], axis=1
                ).reshape(2 * gc, w, Bt)

            ngroups = -(-half // GROUP)
            g0_top = (ngroups - 1) * GROUP
            up_group(g0_top, half - g0_top, True)
            if ngroups > 2:
                jax.lax.fori_loop(
                    0, ngroups - 2,
                    lambda j, _: (
                        up_group((ngroups - 2 - j) * GROUP, GROUP, False),
                        0,
                    )[1],
                    0,
                )
            if ngroups > 1:
                up_group(0, GROUP, False)
        return s_ref[0:N]

    def one_iter(_, c):
        x, zx, zd, zc, yx, yd, yc = c
        rx, rd_, rc = rx_ref[:], rd_ref[:], rc_ref[:]
        rhs = sigma * x - q_ref[:] + mat_AT(
            rx * zx - yx, rd_ * zd - yd, rc * zc - yc
        )
        xt = cr_solve(rhs)
        ax, ad, ac = mat_A(xt)
        x_n = alpha * xt + (1.0 - alpha) * x

        def relax(zt, z, y, rho, lo, hi):
            z_rel = alpha * zt + (1.0 - alpha) * z
            z_new = jnp.clip(z_rel + y / rho, lo, hi)
            y_new = y + rho * (z_rel - z_new)
            return z_new, y_new

        zx_n, yx_n = relax(ax, zx, yx, rx, lx_ref[:], ux_ref[:])
        zd_n, yd_n = relax(ad, zd, yd, rd_, ld_ref[:], ud_ref[:])
        zc_n, yc_n = relax(ac, zc, yc, rc, lc_ref[:], uc_ref[:])
        return (x_n, zx_n, zd_n, zc_n, yx_n, yd_n, yc_n)

    def maxsec(a):
        return jnp.max(a, axis=tuple(range(a.ndim - 1)))[None, :]

    def residuals(x, zx, zd, zc, yx, yd, yc):
        ex, ed, ec = ex_ref[:], ed_ref[:], ec_ref[:]
        ds = ds_ref[:]
        q = q_ref[:]
        ax, ad, ac = mat_A(x)
        px = mat_P(x)
        aty = mat_AT(yx, yd, yc)
        r_prim = jnp.maximum(
            jnp.maximum(
                maxsec(jnp.abs((ax - zx) * ex)),
                maxsec(jnp.abs((ad - zd) * ed)),
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
    zx, zd, zc = zx0_ref[:], zd0_ref[:], zc0_ref[:]
    done = done0_ref[:]
    inf_row = jnp.full((1, x.shape[-1]), jnp.inf, dtype)
    it_inc = jnp.zeros((1, x.shape[-1]), jnp.int32)

    def active(done, k):
        return jnp.logical_and(done == 0, it0 + k < max_iter)

    def cond(state):
        k = state[0]
        done = state[8]
        return jnp.logical_and(k < interval, jnp.any(active(done, k)))

    def body(state):
        k, x, zx, zd, zc, yx, yd, yc, done, it_inc, rp, rd, mp, md = state
        act = active(done, k)
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
def banded_admm_chunk_cr(
    it0, done0, HbT, J0T, J1T, JcT, qT, boundsT, scaleT,
    xT, yxT, ydT, ycT, zxT, zdT, zcT,
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
    """Cyclic-reduction twin of ``banded_admm_chunk`` — same signature and
    returns; see the module docstring for when the driver picks it
    (``banded_solver="cr"`` on the batch path / long horizons).
    """
    B = xT.shape[-1]
    if B % batch_tile:
        raise ValueError(f"batch {B} not divisible by tile {batch_tile}")
    grid = (B // batch_tile,)
    dtype = xT.dtype
    N, w = HbT.shape[0], HbT.shape[1]
    _, nd_slots, nl_slots = cr_level_plan(N)

    def spec(a):
        blk = a.shape[:-1] + (batch_tile,)
        nl = a.ndim - 1
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
        jax.ShapeDtypeStruct(xT.shape, dtype),
        jax.ShapeDtypeStruct(yxT.shape, dtype),
        jax.ShapeDtypeStruct(ydT.shape, dtype),
        jax.ShapeDtypeStruct(ycT.shape, dtype),
        jax.ShapeDtypeStruct(yxT.shape, dtype),
        jax.ShapeDtypeStruct(ydT.shape, dtype),
        jax.ShapeDtypeStruct(ycT.shape, dtype),
        jax.ShapeDtypeStruct((1, B), jnp.int32),
        jax.ShapeDtypeStruct((1, B), jnp.int32),
        jax.ShapeDtypeStruct((1, B), dtype),
        jax.ShapeDtypeStruct((1, B), dtype),
        jax.ShapeDtypeStruct((1, B), dtype),
        jax.ShapeDtypeStruct((1, B), dtype),
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
    in_specs = [spec(a) for a in inputs]
    # Hb (input index 2) stays in HBM/ANY, whole-array: the kernel DMAs
    # the tile slice into its dw scratch (see _kernel docstring).
    in_specs[2] = pl.BlockSpec(memory_space=pl.ANY)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=out_shapes,
        in_specs=in_specs,
        out_specs=tuple(spec(jax.ShapeDtypeStruct(s.shape, s.dtype))
                        for s in out_shapes),
        scratch_shapes=[
            # +1 slot when level 0 pads an odd horizon to even
            pltpu.VMEM((N + (N % 2), w, batch_tile), dtype),  # s (rhs rows)
            pltpu.VMEM((nd_slots, w, batch_tile), dtype),  # s2 (odd rhs)
            pltpu.VMEM((N + (N % 2), w, w, batch_tile), dtype),  # dw
            pltpu.VMEM((nd_slots + 1, w, w, batch_tile), dtype),  # dinv
            pltpu.VMEM((nl_slots, w, w, batch_tile), dtype),  # L
            pltpu.VMEM((N + (N % 2), w, w, batch_tile), dtype),  # LT
            pltpu.SemaphoreType.DMA(()),  # Hb copy tracking
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=117 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*inputs)
    (x, yx, yd, yc, zx, zd, zc, done, it_inc, rp, rd, mp, md) = outs
    return (
        x, yx, yd, yc, zx, zd, zc,
        done[0], it_inc[0], rp[0], rd[0], mp[0], md[0],
    )
