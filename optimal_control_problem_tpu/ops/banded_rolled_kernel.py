"""Pallas TPU kernel: ROLLED block-tridiagonal ADMM chunk (long horizons).

Same algorithm, layouts, and driver contract as :mod:`.banded_kernel` —
one rho-constant ADMM chunk, batch-LAST ``(N, w, w, B)`` blocks, per-scenario
OSQP termination — but with the horizon loops ROLLED:

* the block factorization and the per-iteration forward/backward sweeps
  are ``lax.fori_loop``s over stages with ``pl.ds`` dynamic ref slices,
  instead of Python-unrolled chains over ``range(N)``;
* operator arrays are never bound as whole kernel VALUES — every use reads
  the ref at the use site, so nothing horizon-sized stays live across the
  sequential sweeps;
* the solves use a TWO-WAY ("burn at both ends" / twisted) factorization:
  elimination runs from BOTH ends toward the middle stage ``m = N // 2``,
  so each sweep is two INDEPENDENT ~N/2-step chains instead of one
  ~N-step chain.  The chains are interleaved in one ``fori_loop`` body, so
  the VPU overlaps their op latencies (the one-way sweep measured ~60 us
  per ADMM iteration at quadrotor h100 and was latency-bound on the
  dependency chain itself — partial unrolling was neutral, see
  docs/PERFORMANCE.md round 4).  Storage is unchanged: top multipliers
  ``g[k] = L[k+1] dinv[k]`` live in ``g`` slots [0, m-1], and the bottom
  chain's TRANSPOSED multipliers ``W[k] = dinv[k+1] L[k+1] = h[k]^T``
  in slots [m, N-2].  The back-substitution also
  hoists the recursion-independent ``u[k] = dinv[k] @ s[k]`` products into
  ONE stage-parallel whole-array pass, halving the op count of every
  dependent backward step.

Why a second kernel exists: the unrolled kernel's code for quadrotor h100
(w=16, N=100) measured **234 MB** of VMEM — only ~75 MB of it real data,
the rest Mosaic register spills from 100 stages x fully-unrolled w=16
sweeps with whole-horizon values live throughout (docs/PERFORMANCE.md,
round-3 "The 16 MB VMEM budget"; VERDICT round-3 weak #1).  Rolling the
stage loops collapses the program to one instance of each block op and
shrinks the live set to a couple of ``(w, w, B)`` blocks, so the working
set is the DATA again and h100 fits on-chip.  The unrolled kernel stays
the fast path for small horizons (cart-pole h20, unicycle h50) where full
unrolling lets Mosaic software-pipeline across stages; the driver
(``solvers/admm_banded_batch.py``) picks per problem size.

Reference analog being replaced: one-at-a-time OSQP-CUDA re-setup per QP
(``sqp_solver/CuCaQP.cpp:271-288``), which never sees the stage structure
at all.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["banded_admm_chunk_rolled", "pick_rolled_tile"]


def _use_cr1(N: int, batch_tile: int) -> bool:
    """Static gate for the depth-1 cyclic-reduction level: one
    WHOLE-ARRAY elimination of all odd stages in front of the two-way
    sweeps.  Per the round-5 probe, Mosaic never overlaps sequential ref
    chains, so the only way to shorten the ~1 us/step factor and sweep
    chains is fewer steps — the level halves every chain for ~15
    stage-parallel whole-array ops.  Requirements: even horizon (odd
    horizons keep the plain two-way path — no remainder machinery), long
    enough to matter, and lane-width tiles or smaller (the level's extra
    ~N/2 coupling blocks push the h100 working set past VMEM at
    batch_tile >= 128, where throughput is already excellent)."""
    return N % 2 == 0 and N >= 16 and batch_tile < 128


def pick_rolled_tile(B: int, N: int, w: int, r: int, r2: int):
    """Batch tile whose ROLLED-kernel working set fits in VMEM, or None.

    Unlike :func:`..solvers.admm_banded_batch.pick_batch_tile` (which must
    model the unrolled kernel's register-spill behavior at ~5x the carry
    rows), the rolled kernel's VMEM use is dominated by the REF data:
    inputs + outputs + scratch, plus transients bounded by the largest
    whole-array elementwise product (one operator-sized array for
    ``mat_P``/``mat_A``) and the while-carry x/y/z values (~2 copies).
    """
    p8 = lambda s: -(-s // 8) * 8
    wp, rp, r2p = p8(w), p8(r), p8(r2)
    nd = N - 1
    carry = 3 * N * wp + 2 * nd * rp + 2 * N * r2p  # x y z sections
    blocks = N * w * wp  # one (N, w, w, .) operator array
    ins = (
        blocks  # Hb
        + 2 * nd * r * wp  # J0 J1
        + N * r2 * wp  # Jc
        + N * wp  # q
        + 3 * (N * wp + nd * rp + N * r2p)  # l/u/rho rows
        + 2 * N * wp + nd * rp + N * r2p + 8  # ds ex ed ec ci
        + 2 * 8  # it0 done0
        + carry
    )
    outs = carry + 6 * 8
    scratch = N * wp + 2 * blocks  # sweep ws + dinv + g (lowT recomputed)
    # Live values: 2x carry (old+new across the while body) and one
    # operator-sized elementwise transient (mat_P / assembly row chains);
    # the rolled loops keep everything else to single-stage blocks.
    values = 2 * carry + blocks
    bytes_per_lane = 4 * (ins + outs + scratch + values)
    budget = 108 * 1024 * 1024
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
    hb_ref,  # (N, w, w, Bt)
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
    # scratch (no lowT array: the subdiag transposes are recomputed
    # per stage inside the factor loop, saving an (N, w, w, B) buffer)
    s_ref,  # (N, w, Bt) sweep workspace
    dinv_ref,  # (N, w, w, Bt) M diag -> pivot inverses
    g_ref,  # (N-1, w, w, Bt) M subdiag -> multipliers
    la_ref,  # (H-1, w, w, Bt) depth-1 CR odd->even-above couplings
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
    def _run_grouped(count, step, unroll=4):
        """Run ``step(i)`` for i in [0, count) — ``unroll`` steps per fori
        iteration (dynamic base + static offsets), remainder unrolled
        statically.  The sweeps use unroll=4: their ~1 us/iteration cost
        is fori loop machinery, not compute (measured round 5 — UNROLL=1
        twin sweeps ran 136 us/ADMM-iteration vs ~60 for the one-way
        UNROLL=4 kernel).  The FACTOR runs unroll=1: its pair bodies are
        ~400 ops each and unrolling them 4x pushed Mosaic's scoped-vmem
        stack 5.5 MB past the limit at quadrotor h100."""
        groups = count // unroll

        def group_body(g, _):
            i0 = g * unroll
            for j in range(unroll):
                step(i0 + j)
            return 0

        if groups > 0:
            jax.lax.fori_loop(0, groups, group_body, 0)
        for i in range(groups * unroll, count):
            step(i)

    it0 = it0_ref[:]
    ci = ci_ref[:]  # (1, Bt)

    eye_w = jnp.expand_dims(jnp.eye(w, dtype=dtype), -1)  # (w, w, 1)
    eye_w4 = jnp.expand_dims(eye_w, 0)  # (1, w, w, 1)

    # ---- M assembly (row-by-row into scratch) --------------------------
    # Same row-chain accumulation order as banded_kernel._kernel, but
    # every operand is a per-(row, term) REF SLICE read at the use site —
    # the whole-array value reads the unrolled kernel makes (9-13 MB live
    # across the prologue) are exactly the Mosaic stack pressure this
    # variant exists to avoid.
    def row_r(rho_ref_, ja_ref, jb_ref, a, lo=0, hi=None):
        acc = None
        for i in range(ja_ref.shape[1]):
            rho_i = jnp.expand_dims(rho_ref_[lo:hi, i : i + 1, :], 2)
            t = (rho_i * ja_ref[lo:hi, i : i + 1, a : a + 1, :]) * jb_ref[
                lo:hi, i : i + 1, :, :
            ]
            acc = t if acc is None else acc + t
        return acc

    dinv_ref[:] = hb_ref[:]
    for a in range(w):
        # diagonal entries: + sigma + rho_x (per row a)
        dinv_ref[:, a : a + 1, a : a + 1, :] = dinv_ref[
            :, a : a + 1, a : a + 1, :
        ] + (sigma + jnp.expand_dims(rx_ref[:, a : a + 1, :], 2))
    for a in range(w):
        dinv_ref[:nd_, a : a + 1, :, :] = (
            dinv_ref[:nd_, a : a + 1, :, :]
            + row_r(rd_ref, j0_ref, j0_ref, a)
        )
    for a in range(w):
        dinv_ref[1:, a : a + 1, :, :] = (
            dinv_ref[1:, a : a + 1, :, :]
            + row_r(rd_ref, j1_ref, j1_ref, a)
        )
    for a in range(w):
        dinv_ref[:, a : a + 1, :, :] = (
            dinv_ref[:, a : a + 1, :, :]
            + row_r(rc_ref, jc_ref, jc_ref, a)
        )
    for a in range(w):
        g_ref[:, a : a + 1, :, :] = row_r(rd_ref, j1_ref, j0_ref, a)

    # ---- block helpers on (1, w, w, Bt) single-stage slices ------------
    def spd_inv4(m):
        """Unrolled Gauss-Jordan on one (1, w, w, Bt) SPD block — same
        elementwise op order as banded_kernel.spd_inv_bl."""
        inv = jnp.broadcast_to(eye_w4, m.shape).astype(m.dtype)
        for k in range(w):
            piv = m[:, k : k + 1, k : k + 1, :]
            mrow = m[:, k : k + 1, :, :] / piv
            irow = inv[:, k : k + 1, :, :] / piv
            col = m[:, :, k : k + 1, :] * (1.0 - eye_w4[:, :, k : k + 1, :])
            m = m - col * mrow
            inv = inv - col * irow
            rowmask = eye_w4[:, :, k : k + 1, :]  # (1, w, 1, 1): row k
            m = m * (1.0 - rowmask) + rowmask * mrow
            inv = inv * (1.0 - rowmask) + rowmask * irow
        return inv

    def mm4(a, b):
        """(1, w, w, Bt) block product, sequential j-adds."""
        acc = None
        for j in range(w):
            t = a[:, :, j : j + 1, :] * b[:, j : j + 1, :, :]
            acc = t if acc is None else acc + t
        return acc

    # ---- two-way block factorization, ROLLED over stages ---------------
    # Twisted ("burn at both ends") LU: eliminate from stage 0 DOWN and
    # stage N-1 UP simultaneously, meeting at m = N // 2.  Top multipliers
    # g[k] = L[k+1] @ dinv[k] occupy g slots [0, m-1]; the bottom chain
    # stores the TRANSPOSED multipliers W[k] = dinv[k+1] @ L[k+1] = h[k]^T
    # in slots [m, N-2] (each written over the L[k+1] block that slot
    # held, AFTER its only read).  Storing W instead of h keeps every
    # product in this kernel in natural orientation: no block transpose
    # exists on this TPU path, and the per-stage lowT recomputation the
    # one-way factor paid for it (w*r scalar-x-row terms per stage) was
    # ~60% of the measured 0.89 ms per-SQP-step fixed cost at quadrotor
    # h100 (round 5).  Both Schur products L dinv L^T and L^T dinv L are
    # computed row-by-row with the two PROVEN reduction patterns (axis-2
    # row-dot, axis-1 weighted row sum) — see _schur_rows_*.
    # Depth-1 cyclic-reduction level (see _use_cr1): eliminate every ODD
    # stage in one stage-parallel pass, then run the two-way machinery on
    # the H = N/2 reduced (even-stage) system — every sequential chain
    # halves.  Slot layout after the level: dinv[0:H] = reduced diag ->
    # pivot inverses, dinv[H:N] = odd-pivot inverses; g[0:H-1] = reduced
    # couplings -> multipliers, g[H-1:N-1] = original L[2i+1] (odd-below
    # couplings, "Lb"), la[0:H-1] = original L[2i+2] ("La").
    use_cr1 = _use_cr1(N, q_ref.shape[-1])
    H_half = N // 2
    n_sys = H_half if use_cr1 else N
    m_mid = n_sys // 2
    r = j0_ref.shape[1]

    if use_cr1:
        # All reads of the original D/L before any writes.
        dp = dinv_ref[0:N].reshape(H_half, 2, w, w, q_ref.shape[-1])
        d_even, d_odd = dp[:, 0], dp[:, 1]
        gp = g_ref[0 : 2 * (H_half - 1)].reshape(
            H_half - 1, 2, w, w, q_ref.shape[-1]
        )
        Lb = jnp.concatenate([gp[:, 0], g_ref[N - 2 : N - 1]], axis=0)  # (H,)
        La = gp[:, 1]  # (H-1,) couples odd 2i+1 to even 2i+2
        dinv_odd = spd_inv4(d_odd)  # whole-array Gauss-Jordan (H blocks)
        Vb = mm4(dinv_odd, Lb)  # dinv_o L[o]
        Ya = mm4(La, dinv_odd[: H_half - 1])  # L[e'] dinv_o
        # Reduced diagonal, row by row (assembly-style static row writes):
        # D'[i] = d_even[i] - Lb[i]^T dinv_o[i] Lb[i]  (odd above every even)
        #         - [i>0] La[i-1] dinv_o[i-1] La[i-1]^T (odd below).
        for a in range(w):
            t_above = jnp.sum(
                Vb * jnp.expand_dims(Lb[:, :, a, :], 2), axis=1
            )  # (H, w, Bt)
            dinv_ref[0:H_half, a : a + 1, :, :] = jnp.expand_dims(
                d_even[:, a, :, :] - t_above, 1
            )
        for a in range(w):
            t_below = jnp.sum(La * Ya[:, a : a + 1, :, :], axis=2)
            dinv_ref[1:H_half, a : a + 1, :, :] = dinv_ref[
                1:H_half, a : a + 1, :, :
            ] - jnp.expand_dims(t_below, 1)
        # Reduced couplings L'[i] = -La[i] dinv_o[i] Lb[i] = -(Ya Lb)[i];
        # then stash dinv_odd / Lb / La for the per-iteration fold/unfold.
        g_ref[0 : H_half - 1] = -mm4(Ya, Lb[: H_half - 1])
        dinv_ref[H_half:N] = dinv_odd
        g_ref[H_half - 1 : N - 1] = Lb
        la_ref[:] = La

    dinv_ref[0:1] = spd_inv4(dinv_ref[0:1])
    if m_mid < n_sys - 1:
        dinv_ref[n_sys - 1 : n_sys] = spd_inv4(dinv_ref[n_sys - 1 : n_sys])

    def _schur_sub_rows_top(k, L, Y):
        """dinv_ref[k] -= Y @ L^T, row by row: row a = L @ Y[a, :]
        (axis-2 row-dot of L against the broadcast row of Y)."""
        for a in range(w):
            y_a = Y[:, a : a + 1, :, :]  # (1, 1, w, Bt)
            row = jnp.sum(L * y_a, axis=2)  # (1, w, Bt)
            dinv_ref[pl.ds(k, 1), a : a + 1, :, :] = dinv_ref[
                pl.ds(k, 1), a : a + 1, :, :
            ] - jnp.expand_dims(row, 1)

    def _schur_sub_rows_bot(k, A, V):
        """dinv_ref[k] -= A^T @ V, row by row: row a = sum_j A[j, a] V[j, :]
        (column-a weights via integer slice + axis-1 reduction — the bwd
        sweep's proven pattern)."""
        for a in range(w):
            col_a = jnp.expand_dims(A[:, :, a, :], 2)  # (1, w, 1, Bt)
            row = jnp.sum(V * col_a, axis=1)  # (1, w, Bt)
            dinv_ref[pl.ds(k, 1), a : a + 1, :, :] = dinv_ref[
                pl.ds(k, 1), a : a + 1, :, :
            ] - jnp.expand_dims(row, 1)

    def fact_top(k):
        L_k = g_ref[pl.ds(k - 1, 1)]  # L[k]
        g_k = mm4(L_k, dinv_ref[pl.ds(k - 1, 1)])  # L[k] dinv[k-1]
        # dinv[k] <- inv(D[k] - L[k] dinv[k-1] L[k]^T)
        _schur_sub_rows_top(k, L_k, g_k)
        dinv_ref[pl.ds(k, 1)] = spd_inv4(dinv_ref[pl.ds(k, 1)])
        g_ref[pl.ds(k - 1, 1)] = g_k

    def fact_bot(k):
        L_k1 = g_ref[pl.ds(k, 1)]  # L[k+1] (original content of slot k)
        W_k = mm4(dinv_ref[pl.ds(k + 1, 1)], L_k1)  # dinv[k+1] L[k+1]
        # dinv[k] <- inv(D[k] - L[k+1]^T dinv[k+1] L[k+1])
        _schur_sub_rows_bot(k, L_k1, W_k)
        dinv_ref[pl.ds(k, 1)] = spd_inv4(dinv_ref[pl.ds(k, 1)])
        g_ref[pl.ds(k, 1)] = W_k

    # Partial unroll: UNROLL stage-pairs per fori iteration amortizes the
    # per-iteration loop/addressing overhead of the (inherently
    # sequential) stage recurrences without re-inflating the program to
    # the full-unroll size that spilled VMEM.
    nt_f = m_mid - 1  # top steps: k = 1 .. m-1
    nb_f = max(n_sys - 2 - m_mid, 0)  # bottom steps: k = n_sys-2 .. m+1
    common_f = min(nt_f, nb_f)

    def fact_pair(i):
        fact_top(i + 1)
        fact_bot(n_sys - 2 - i)

    _run_grouped(common_f, fact_pair, unroll=1)
    for i in range(common_f, nt_f):
        fact_top(i + 1)
    for i in range(common_f, nb_f):
        fact_bot(n_sys - 2 - i)
    # Middle stage: Schur complements arrive from BOTH sides.
    L_m = g_ref[pl.ds(m_mid - 1, 1)]  # L[m]
    g_m1 = mm4(L_m, dinv_ref[pl.ds(m_mid - 1, 1)])
    _schur_sub_rows_top(m_mid, L_m, g_m1)
    if m_mid < n_sys - 1:
        # slot m still holds L[m+1]: read it for the Schur term, then
        # store W[m] there (its only remaining consumers are the sweeps).
        L_m1 = g_ref[pl.ds(m_mid, 1)]
        W_m = mm4(dinv_ref[pl.ds(m_mid + 1, 1)], L_m1)
        _schur_sub_rows_bot(m_mid, L_m1, W_m)
        g_ref[pl.ds(m_mid, 1)] = W_m
    dinv_ref[pl.ds(m_mid, 1)] = spd_inv4(dinv_ref[pl.ds(m_mid, 1)])
    g_ref[pl.ds(m_mid - 1, 1)] = g_m1

    # ---- operator applications (parallel over stages) ------------------
    # Contractions unrolled over the SMALL index with per-term ref-slice
    # reads: each term is one (N, r|w, Bt) row product, so the peak
    # transient is ~1 MB instead of the (N, r, w, Bt) / (N, w, w, Bt)
    # whole-products (10-13 MB each, three of them live inside residuals)
    # that blew the Mosaic stack budget in the whole-array form.
    def _contract_w(j_ref, xs):
        """sum_j J[., :, j, :] * xs[., j, :] -> (., rows, Bt)."""
        acc = None
        for j in range(w):
            t = j_ref[:, :, j, :] * xs[:, j : j + 1, :]
            acc = t if acc is None else acc + t
        return acc

    def _contract_rows(j_ref, t_sec):
        """sum_i J[., i, :, :] * t[., i, :] -> (., w, Bt)."""
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
        return _contract_w(hb_ref, x)

    # ---- two-way block solve, ROLLED sweeps through s_ref --------------
    def _two_way_solve(rhs):
        """Solve the n_sys-stage (possibly CR-reduced) system held in
        dinv/g slots [0, n_sys); rhs is an (n_sys, w, Bt) value."""
        s_ref[0:n_sys] = rhs

        # Phase 1: forward elimination from both ends (independent
        # chains; interleaved bodies).  Top: s[k] -= g[k-1] s[k-1] for
        # k = 1..m; bottom: s[k] -= h[k] s[k+1] = W[k]^T s[k+1] for
        # k = N-2..m (W stored — so the bottom chain uses the axis-1
        # pattern here and the axis-2 pattern in phase 3, the mirror
        # image of the top chain).  Both chains fold into s[m] (at
        # different loop steps).
        def fwd_top(i):
            k = i + 1
            g_km1 = g_ref[pl.ds(k - 1, 1)]
            s_km1 = jnp.expand_dims(s_ref[pl.ds(k - 1, 1)], 1)  # (1,1,w,Bt)
            s_ref[pl.ds(k, 1)] = s_ref[pl.ds(k, 1)] - jnp.sum(
                g_km1 * s_km1, axis=2
            )

        def fwd_bot(i):
            k = n_sys - 2 - i
            w_k = g_ref[pl.ds(k, 1)]  # W[k] = h[k]^T
            s_k1 = jnp.expand_dims(s_ref[pl.ds(k + 1, 1)], 2)  # (1,w,1,Bt)
            s_ref[pl.ds(k, 1)] = s_ref[pl.ds(k, 1)] - jnp.sum(
                w_k * s_k1, axis=1
            )

        nt = m_mid  # top: k = 1 .. m
        nb = n_sys - 1 - m_mid  # bottom: k = n_sys-2 .. m
        common = min(nt, nb)

        def fwd_pair(i):
            fwd_top(i)
            fwd_bot(i)

        _run_grouped(common, fwd_pair)
        for i in range(common, nt):
            fwd_top(i)
        for i in range(common, nb):
            fwd_bot(i)

        # Phase 2: u[k] = dinv[k] @ s[k] for ALL stages as one
        # stage-parallel whole-array pass (recursion-independent: top
        # back-subst needs u below m, bottom above m, and u[m] IS x[m]).
        # This halves the op count of every dependent phase-3 step.
        # Column-accumulation form (the mat_P idiom): one (n_sys, w, Bt)
        # accumulator + one term live — the row-slice/concat form kept all
        # w row pieces live and pushed the Mosaic stack 5.5 MB over VMEM
        # at h100 (and sublane-axis concats are a known Mosaic crash).
        s_val = s_ref[0:n_sys]
        acc = None
        for j in range(w):
            t = dinv_ref[0:n_sys, :, j, :] * s_val[:, j : j + 1, :]
            acc = t if acc is None else acc + t
        s_ref[0:n_sys] = acc

        # Phase 3: back-substitution outward from the middle (independent
        # chains).  Top: x[k] = u[k] - g[k]^T x[k+1] for k = m-1..0;
        # bottom: x[k] = u[k] - h[k-1]^T x[k-1] = u[k] - W[k-1] x[k-1]
        # for k = m+1..N-1 (W stored, so this side is a plain row-dot).
        def bwd_top(i):
            k = m_mid - 1 - i
            x_next = jnp.expand_dims(s_ref[pl.ds(k + 1, 1)], 2)  # (1,w,1,Bt)
            s_ref[pl.ds(k, 1)] = s_ref[pl.ds(k, 1)] - jnp.sum(
                g_ref[pl.ds(k, 1)] * x_next, axis=1
            )

        def bwd_bot(i):
            k = m_mid + 1 + i
            x_prev = jnp.expand_dims(s_ref[pl.ds(k - 1, 1)], 1)  # (1,1,w,Bt)
            s_ref[pl.ds(k, 1)] = s_ref[pl.ds(k, 1)] - jnp.sum(
                g_ref[pl.ds(k - 1, 1)] * x_prev, axis=2
            )

        def bwd_pair(i):
            bwd_top(i)
            bwd_bot(i)

        _run_grouped(common, bwd_pair)
        for i in range(common, nt):
            bwd_top(i)
        for i in range(common, nb):
            bwd_bot(i)
        return s_ref[0:n_sys]

    if use_cr1:

        def btd_solve(rhs):
            """Depth-1 CR solve: fold the odd stages' rhs into the evens
            (all stage-parallel), run the two-way solve on the H-stage
            reduced system, then recover the odds — per-iteration
            sequential depth halves for ~10 whole-array ops."""
            Bt_ = rhs.shape[-1]
            bp = rhs.reshape(H_half, 2, w, Bt_)
            b_even, b_odd = bp[:, 0], bp[:, 1]
            dinv_o = dinv_ref[H_half:N]
            Lb = g_ref[H_half - 1 : N - 1]
            La = la_ref[:]
            # t_o = dinv_o b_odd (stage-parallel matvec, axis-2 row-dot)
            t_o = jnp.sum(dinv_o * jnp.expand_dims(b_odd, 1), axis=2)
            # b'_even[i] = b_even[i] - Lb[i]^T t_o[i] - [i>0] La[i-1] t_o[i-1]
            fold = b_even - jnp.sum(
                Lb * jnp.expand_dims(t_o, 2), axis=1
            )
            low = jnp.sum(
                La * jnp.expand_dims(t_o[: H_half - 1], 1), axis=2
            )
            zrow = jnp.zeros((1, w, Bt_), rhs.dtype)
            fold = fold - jnp.concatenate([zrow, low], axis=0)
            x_even = _two_way_solve(fold)
            # x_o = dinv_o (b_odd - Lb x_even - [i<H-1] La^T x_even[i+1])
            rhs_o = b_odd - jnp.sum(
                Lb * jnp.expand_dims(x_even, 1), axis=2
            )
            up = jnp.sum(
                La * jnp.expand_dims(x_even[1:], 2), axis=1
            )
            rhs_o = rhs_o - jnp.concatenate([up, zrow], axis=0)
            x_odd = jnp.sum(dinv_o * jnp.expand_dims(rhs_o, 1), axis=2)
            return jnp.stack([x_even, x_odd], axis=1).reshape(N, w, Bt_)

    else:
        btd_solve = _two_way_solve

    def one_iter(_, c):
        x, zx, zd, zc, yx, yd, yc = c
        rx, rd_, rc = rx_ref[:], rd_ref[:], rc_ref[:]
        rhs = sigma * x - q_ref[:] + mat_AT(
            rx * zx - yx, rd_ * zd - yd, rc * zc - yc
        )
        xt = btd_solve(rhs)
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
def banded_admm_chunk_rolled(
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
    """Rolled-loop twin of :func:`..ops.banded_kernel.banded_admm_chunk` —
    identical signature, returns, and per-iteration semantics; see the
    module docstring for when the driver picks this variant.
    """
    B = xT.shape[-1]
    if B % batch_tile:
        raise ValueError(f"batch {B} not divisible by tile {batch_tile}")
    grid = (B // batch_tile,)
    dtype = xT.dtype

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
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=out_shapes,
        in_specs=[spec(a) for a in inputs],
        out_specs=tuple(spec(jax.ShapeDtypeStruct(s.shape, s.dtype))
                        for s in out_shapes),
        scratch_shapes=[
            pltpu.VMEM(xT.shape[:-1] + (batch_tile,), dtype),  # sweep ws
            pltpu.VMEM(HbT.shape[:-1] + (batch_tile,), dtype),  # dinv
            pltpu.VMEM(
                (HbT.shape[0] - 1,) + HbT.shape[1:-1] + (batch_tile,), dtype
            ),  # g
            # la: the depth-1 CR level's odd->even-above couplings
            # (L[2i+2], i < H-1); a 1-slot dummy when the level is off.
            pltpu.VMEM(
                (max(HbT.shape[0] // 2 - 1, 1) if _use_cr1(HbT.shape[0], batch_tile) else 1,)
                + HbT.shape[1:-1] + (batch_tile,),
                dtype,
            ),
        ],
        # Ceiling probed against quadrotor h100: Mosaic's scoped-vmem
        # scheduler spends up to the limit (raising it raised the
        # allocation), so this is set just above the measured minimum
        # rather than at the chip's ~128 MB physical capacity.  (The
        # two-way solve measured 114.53 MB at h100 — 544 KB past the old
        # 114 MB ceiling; 116 MB clears it with margin.)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=116 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*inputs)
    (x, yx, yd, yc, zx, zd, zc, done, it_inc, rp, rd, mp, md) = outs
    return (
        x, yx, yd, yc, zx, zd, zc,
        done[0], it_inc[0], rp[0], rd[0], mp[0], md[0],
    )
