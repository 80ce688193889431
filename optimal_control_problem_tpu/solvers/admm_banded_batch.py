"""Batch-native banded ADMM: whole-batch solves through the fused Pallas chunk.

``jax.vmap(admm_solve_banded)`` is semantically right but maps each scenario
to its own Pallas-free XLA while-loop whose ~2N sequential block-sweep steps
are launch-overhead bound (docs/PERFORMANCE.md, "Next steps").  This driver
instead keeps the WHOLE scenario batch inside one kernel invocation per
rho-constant chunk (``ops/banded_kernel.py``), with every hot-loop array in
batch-LAST layout so the scenario batch fills the TPU's 128-wide lanes.

Division of labor per solve:

* prepare (XLA, batch-leading, once): Ruiz equilibration and per-row rho
  — ``jax.vmap`` of the per-scenario pieces from :mod:`.admm_banded`;
* iterate (Pallas, batch-last): M assembly + block-Thomas factorization
  at chunk entry (in-kernel — as XLA ops the factorization is a
  launch-bound sequential scan measured at over half the cart-pole tick),
  then up to ``adaptive_rho_interval`` iterations per kernel entry with
  per-scenario OSQP termination checks;
* between chunks (XLA): infeasibility certificates on chunk deltas and
  OSQP adaptive rho — the refactorization happens implicitly at the next
  kernel entry; same adapt-every-interval semantics as the dense
  ``backend="pallas"`` path in :mod:`.admm`;
* finish (XLA): optional active-set polish (``banded_polish``), unscaling.

Semantics match ``jax.vmap(admm_solve_banded)`` with ``banded_solver=
"thomas"``, except that infeasibility certificates are evaluated once per
chunk instead of once per check block (exactly like the dense Pallas path).

Reference analog: OSQP's CUDA backend driven through CuCaQP
(``sqp_solver/CuCaQP.cpp:271-288``) solves ONE QP at a time; batched
scenario MPC is a capability the reference does not have at all
(SURVEY.md section 2, "Parallelism").
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.banded_kernel import banded_admm_chunk
from ..ops.banded_cr_kernel import banded_admm_chunk_cr, pick_cr_tile
from ..ops.banded_rolled_kernel import banded_admm_chunk_rolled, pick_rolled_tile
from ..ops.block_tridiag import btd_factor, btd_solve
from .admm import ADMMSettings, QPSolution, _RHO_MAX, _RHO_MIN, f32_matmuls
from .admm_banded import (
    BandedQP,
    _rho_vec,
    banded_certificates,
    banded_polish,
    ruiz_equilibrate_banded,
)

__all__ = [
    "admm_solve_banded_batch",
    "admm_solve_banded_batch_T",
    "pick_batch_tile",
    "ruiz_scalings_batch",
    "ruiz_scalings_batch_T",
]


def ruiz_scalings_batch(qp: BandedQP, iters: int):
    """Batch Ruiz factors only: ``(D (B, n), E (B, m), c (B,))``.

    Batch-LAST vmap (scenarios in lanes) like the driver's own prepare;
    used by the SQP layer to hoist equilibration out of the SQP scan
    (``ADMMSettings.scaling_refresh == "tick"``).
    """
    qpT = jax.tree_util.tree_map(_t, qp)
    DT, ET, cT = ruiz_scalings_batch_T(qpT, iters)
    return _ut(DT), _ut(ET), cT


def ruiz_scalings_batch_T(qpT: BandedQP, iters: int):
    """Batch-LAST Ruiz factors: ``(D (n, B), E (m, B), c (B,))`` from a
    batch-last QP (trailing scenario axis on every field) — the
    zero-relayout variant for callers that already hold batch-last
    operators (the SQP layer's batch-last derivative path)."""
    _, DT, ET, cT = jax.vmap(
        lambda q_: ruiz_equilibrate_banded(q_, iters),
        in_axes=-1,
        out_axes=-1,
    )(qpT)
    return DT, ET, cT


def _apply_scalings_T(qpT: BandedQP, DT, ET, cT, N, w, r, r2):
    """Batch-last :func:`..solvers.admm_banded.apply_scalings`: one
    elementwise pass, trailing scenario axis everywhere (``DT (n, B)``,
    ``ET (m, B)``, ``cT (B,)``).  Same per-element multiply order as the
    per-scenario version, so iterates bit-match the vmapped reference."""
    n = N * w
    DnT = DT.reshape(N, w, -1)
    EdT = ET[n : n + (N - 1) * r].reshape(N - 1, r, -1) if r else None
    EcT = ET[n + (N - 1) * r :].reshape(N, r2, -1) if r2 else None
    return BandedQP(
        Hb=cT * DnT[:, :, None, :] * qpT.Hb * DnT[:, None, :, :],
        J0=EdT[:, :, None, :] * qpT.J0 * DnT[:-1, None, :, :] if r else qpT.J0,
        J1=EdT[:, :, None, :] * qpT.J1 * DnT[1:, None, :, :] if r else qpT.J1,
        Jc=EcT[:, :, None, :] * qpT.Jc * DnT[:, None, :, :] if r2 else qpT.Jc,
        q=cT * DT * qpT.q,
        l=ET * qpT.l,
        u=ET * qpT.u,
    )


def pick_batch_tile(B: int, N: int, w: int, r: int, r2: int):
    """Batch tile whose chunk-kernel working set fits in VMEM, or None.

    Models what Mosaic actually allocates for one grid program:

    * the f32 VMEM tile is (8, 128) — the SECOND-MINOR dim of every
      batch-last block pads up to a multiple of 8 sublanes (w=5 -> 8 is
      1.6x, r=3 -> 8 is 2.7x on those arrays), and the MINOR (batch/lane)
      dim pads up to a multiple of 128 lanes (a small batch of 8 scenarios
      still allocates 128 lanes);
    * every block is SINGLE-buffered (``pl.Buffered(buffer_count=1)`` in
      the kernel's specs): a chunk program computes for milliseconds while
      its working set streams in microseconds, so the default revolving
      double buffer would pay 2x VMEM for overlap that cannot matter;
    * on top of the blocks, the compiled loop body keeps live VALUES —
      the while-carry x/y/z sections plus ``one_iter``/residual
      temporaries — measured at ~5x the carry-section rows (unicycle
      h50 tile 128: 17.24 MB total vs 10.4 MB of blocks);
    * the budget is the chip, not the default scoped-vmem guard: v5e has
      ~128 MB of physical VMEM (probed: a 126 MB scratch compiles and
      runs), and the kernel raises ``vmem_limit_bytes`` accordingly.
      96 MB here leaves margin for Mosaic internals and the measurement
      error of the value model.

    Mosaic requires the batch block dim to be a multiple of 128 (the lane
    width) or equal to the full array dim, so the choice is: the whole
    batch as one program if it fits, else the largest fitting multiple of
    128, else None — in which case the driver falls back to the vmapped
    XLA loop (the working set simply does not fit on-chip for that
    problem size).
    """
    nd = N - 1
    # Zero-size sections are not allocated at all (p8(0) = 0); nonzero
    # sections pad up to the 8-sublane tile.  Note admm_solve_banded_batch
    # pads absent sections to 1 inert row (_pad_sections) and passes
    # max(r, 1) / max(r2, 1) here, so on that path the minimum-8 charge
    # still (correctly) applies.
    p8 = lambda s: -(-s // 8) * 8
    wp, rp, r2p = p8(w), p8(r), p8(r2)
    carry = 3 * N * wp + 2 * nd * rp + 2 * N * r2p  # x y z sections
    ins = (
        N * w * wp  # Hb operator blocks
        + 2 * nd * r * wp  # J0, J1
        + N * r2 * wp  # Jc
        + N * wp  # q
        + 3 * (N * wp + nd * rp + N * r2p)  # l/u/rho rows per section
        + 2 * N * wp + nd * rp + N * r2p + 8  # scale rows ds ex ed ec ci
        + 7 * 8  # it0/done0 + per-scenario scalars
        + carry  # carry-in x y z sections
    )
    outs = carry + 6 * 8
    # sweep workspace + the M diag/subdiag/subdiag^T scratch the in-kernel
    # factorization overwrites with dinv/g (M is assembled row-by-row
    # directly into these, so its transients are single rows).
    scratch = N * wp + 3 * N * w * wp
    # Live loop values + temporaries: ~5x the carry rows (measured,
    # unicycle h50) plus the whole-factor value reads (dinv, g).
    values = 5 * (carry + N * wp) + 2 * N * w * wp
    bytes_per_lane = 4 * (ins + outs + scratch + values)
    # Note the model intentionally undercounts Mosaic's register-spill
    # behavior on long-horizon wide-block problems: quadrotor h100 (w=16)
    # measured 234 MB actual vs ~116 MB modeled — both far over budget,
    # so the reject decision is right for the cases that matter, but do
    # not trust the model near the boundary for w > 8.
    budget = 96 * 1024 * 1024
    lanes = lambda t: -(-t // 128) * 128  # minor dim pads to 128 lanes
    if lanes(max(B, 1)) * bytes_per_lane <= budget:
        return max(B, 1)
    for tile in (512, 384, 256, 128):
        if tile <= B and tile * bytes_per_lane <= budget:
            return tile
    return None


def _t(a):
    """Batch-leading -> batch-last."""
    return jnp.moveaxis(a, 0, -1)


def _ut(a):
    """Batch-last -> batch-leading."""
    return jnp.moveaxis(a, -1, 0)


def _pad_sections_T(qpT: BandedQP, y0T, N, w):
    """Ensure r >= 1 and r2 >= 1 by inserting all-zero Jacobian rows with
    loose bounds (the kernel has a fixed three-section signature).  Zero
    rows are inert: Ruiz gives them unit scaling (``_limit_scaling(0) = 1``)
    and their iterates stay exactly zero.  Batch-LAST layout (trailing
    scenario axis).  Returns (qpT, y0T, had_r, had_r2)."""
    B = qpT.Hb.shape[-1]
    nd = N - 1
    n = N * w
    r = qpT.J0.shape[1]
    r2 = qpT.Jc.shape[1]
    had_r, had_r2 = r > 0, r2 > 0
    dtype = qpT.Hb.dtype
    l, u, q = qpT.l, qpT.u, qpT.q
    J0, J1, Jc = qpT.J0, qpT.J1, qpT.Jc
    inf = jnp.inf
    if not had_r:
        J0 = jnp.zeros((nd, 1, w, B), dtype)
        J1 = jnp.zeros((nd, 1, w, B), dtype)
        pad = jnp.full((nd, B), -inf, dtype)
        l = jnp.concatenate([l[:n], pad, l[n:]], axis=0)
        u = jnp.concatenate([u[:n], -pad, u[n:]], axis=0)
        y0T = jnp.concatenate(
            [y0T[:n], jnp.zeros((nd, B), dtype), y0T[n:]], axis=0
        )
    if not had_r2:
        Jc = jnp.zeros((N, 1, w, B), dtype)
        pad = jnp.full((N, B), -inf, dtype)
        l = jnp.concatenate([l, pad], axis=0)
        u = jnp.concatenate([u, -pad], axis=0)
        y0T = jnp.concatenate([y0T, jnp.zeros((N, B), dtype)], axis=0)
    return BandedQP(qpT.Hb, J0, J1, Jc, q, l, u), y0T, had_r, had_r2


def _strip_sections_T(vT, N, w, r, r2, had_r, had_r2):
    """Drop the rows added by :func:`_pad_sections_T` from a flat (m, B)."""
    if had_r and had_r2:
        return vT
    n = N * w
    nd = N - 1
    parts = [vT[:n]]
    if had_r:
        parts.append(vT[n : n + nd * r])
    if had_r2:
        parts.append(vT[n + nd * r :])
    return jnp.concatenate(parts, axis=0)


@partial(
    jax.jit,
    static_argnames=("settings", "batch_tile", "interpret", "rolled"),
)
@f32_matmuls
def admm_solve_banded_batch(
    qp: BandedQP,
    settings: ADMMSettings = ADMMSettings(),
    x0: Optional[jnp.ndarray] = None,  # (B, n) warm start
    y0: Optional[jnp.ndarray] = None,  # (B, m)
    batch_tile: Optional[int] = None,
    interpret: Optional[bool] = None,
    rolled: Optional[bool] = None,  # None = auto (when unrolled won't fit)
    scalings=None,  # optional precomputed (D (B,n), E (B,m), c (B,))
):
    """Solve a BATCH of stage-structured QPs (leading dim B on every field).

    Returns a :class:`QPSolution` with leading batch dims.  Numerically
    equivalent to ``jax.vmap(admm_solve_banded)`` (thomas solver), but the
    iteration loop runs as the fused batch-last Pallas kernel.

    This is the batch-LEADING public boundary: one transpose per array at
    entry and exit; everything inside (:func:`_solve_banded_batch_T`) is
    batch-last end to end.  Callers that already hold batch-last operators
    (the SQP layer's batch-last derivative path) should use
    :func:`admm_solve_banded_batch_T` and skip the round trip.
    """
    qpT = jax.tree_util.tree_map(_t, qp)
    x0T = None if x0 is None else x0.T
    y0T = None if y0 is None else y0.T
    scalingsT = (
        None if scalings is None
        else (scalings[0].T, scalings[1].T, scalings[2])
    )
    xT, yT, zT, it_b, done, rp, rd, pinf, dinf = _solve_banded_batch_T(
        qpT, settings, x0T, y0T, batch_tile, interpret, rolled, scalingsT
    )
    return QPSolution(
        x=xT.T, y=yT.T, z=zT.T,
        iters=it_b, converged=done, r_prim=rp, r_dual=rd,
        prim_inf=pinf, dual_inf=dinf,
    )


@partial(
    jax.jit,
    static_argnames=("settings", "batch_tile", "interpret", "rolled"),
)
@f32_matmuls
def admm_solve_banded_batch_T(
    qpT: BandedQP,
    settings: ADMMSettings = ADMMSettings(),
    x0T: Optional[jnp.ndarray] = None,  # (n, B) warm start
    y0T: Optional[jnp.ndarray] = None,  # (m, B)
    batch_tile: Optional[int] = None,
    interpret: Optional[bool] = None,
    rolled: Optional[bool] = None,
    scalingsT=None,  # optional precomputed (D (n,B), E (m,B), c (B,))
):
    """Batch-LAST twin of :func:`admm_solve_banded_batch`: every field of
    ``qpT`` carries a TRAILING scenario axis (``Hb (N,w,w,B)``, ``q/l/u
    (rows, B)``), warm starts/returns are ``(rows, B)``.  Zero relayouts —
    arrays flow straight from a batch-last QP build into the batch-last
    Pallas kernels (the per-SQP-step transpose round trip was the dominant
    prepare cost at cart-pole h20 B=256; docs/PERFORMANCE.md round 5).

    Returns ``(x (n,B), y (m,B), z (m,B), iters (B,), converged, r_prim,
    r_dual, prim_inf, dual_inf)``.
    """
    return _solve_banded_batch_T(
        qpT, settings, x0T, y0T, batch_tile, interpret, rolled, scalingsT
    )


def _solve_banded_batch_T(
    qpT: BandedQP,
    st: ADMMSettings,
    x0T,
    y0T,
    batch_tile,
    interpret,
    rolled,
    scalingsT,
):
    dtype = qpT.Hb.dtype
    N, w, B = qpT.Hb.shape[0], qpT.Hb.shape[1], qpT.Hb.shape[-1]
    if N < 2:
        raise ValueError("batch-native banded path requires horizon >= 2")
    n = N * w
    m_in = qpT.l.shape[0]
    sigma = float(st.sigma)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    use_cr = st.banded_solver == "cr"
    if batch_tile is None:
        r_eff = max(qpT.J0.shape[1], 1)
        r2_eff = max(qpT.Jc.shape[1], 1)
        if use_cr:
            # banded_solver="cr": log-depth cyclic-reduction chunk kernel
            # (ops/banded_cr_kernel.py) — the latency choice for long
            # horizons where the Thomas sweeps' ~2N sequential block steps
            # bound every ADMM iteration.
            batch_tile = pick_cr_tile(B, N, w, r_eff, r2_eff)
            if batch_tile is not None and not interpret and batch_tile < 128:
                # The kernel's HBM->VMEM Hb DMA needs 128-aligned lanes;
                # padding the batch to a full lane tile is physically free
                # (lanes pad to 128 regardless) — padded rows enter frozen.
                batch_tile = 128
        elif rolled:
            batch_tile = pick_rolled_tile(B, N, w, r_eff, r2_eff)
        else:
            batch_tile = pick_batch_tile(B, N, w, r_eff, r2_eff)
            if batch_tile is None and rolled is None:
                # Unrolled kernel's (spill-heavy) working set does not fit:
                # try the ROLLED kernel, whose VMEM use is the data itself
                # (ops/banded_rolled_kernel.py) — this is what puts
                # quadrotor h100 on a fused kernel instead of the XLA
                # fallback.
                batch_tile = pick_rolled_tile(B, N, w, r_eff, r2_eff)
                rolled = batch_tile is not None
    elif batch_tile < 0:
        # Explicit fallback request (tests / VMEM-pressure escape hatch).
        batch_tile = None
    elif not interpret and batch_tile % 128 and batch_tile < B:
        # Mosaic lane constraint (see pick_batch_tile): the batch block dim
        # must be a multiple of 128 or cover the whole (padded) batch.
        # Sub-batch non-multiples only work in interpret mode.
        raise ValueError(
            f"batch_tile={batch_tile} must be a multiple of 128 or >= the "
            f"batch ({B}) on real TPU"
        )
    elif use_cr and not interpret and batch_tile < 128:
        # Same 128-lane rounding as the auto path: the CR kernel's
        # HBM->VMEM Hb DMA needs 128-aligned lane slices; a smaller
        # explicit tile would hit a Mosaic compile failure.  Padding is
        # physically free (lanes pad to 128 regardless).
        batch_tile = 128
    if batch_tile is None:
        # Working set does not fit in VMEM at any lane-aligned tile:
        # fall back to the vmapped XLA loop (same semantics; batch-leading
        # internally, so transpose at this rare boundary).
        from .admm_banded import admm_solve_banded

        sol = jax.vmap(
            lambda q_, x_, y_: admm_solve_banded(q_, st, x0=x_, y0=y_)
        )(
            jax.tree_util.tree_map(_ut, qpT),
            jnp.zeros((B, n), dtype) if x0T is None else x0T.T,
            jnp.zeros((B, m_in), dtype) if y0T is None else y0T.T,
        )
        return (
            sol.x.T, sol.y.T, sol.z.T, sol.iters, sol.converged,
            sol.r_prim, sol.r_dual, sol.prim_inf, sol.dual_inf,
        )

    qpT = qpT._replace(
        l=jnp.minimum(qpT.l.astype(dtype), qpT.u.astype(dtype)),
        u=qpT.u.astype(dtype),
        q=qpT.q.astype(dtype),
    )
    x0T = jnp.zeros((n, B), dtype) if x0T is None else x0T.astype(dtype)
    y0T = jnp.zeros((m_in, B), dtype) if y0T is None else y0T.astype(dtype)
    qpT, y0T, had_r, had_r2 = _pad_sections_T(qpT, y0T, N, w)
    r = qpT.J0.shape[1]
    r2 = qpT.Jc.shape[1]
    m = qpT.l.shape[0]
    nd = N - 1
    if scalingsT is not None and not (had_r and had_r2):
        # Precomputed E was built on the UNPADDED sections; insert unit
        # scalings for the inert rows _pad_sections_T added (zero Jacobian
        # rows get _limit_scaling(0) = 1 from Ruiz too).
        D_, E_, c_ = scalingsT
        parts = [E_[:n]]
        if had_r:
            parts.append(E_[n : n + nd * r])
            sc_off = n + nd * r
        else:
            parts.append(jnp.ones((nd, E_.shape[-1]), E_.dtype))
            sc_off = n
        if had_r2:
            parts.append(E_[sc_off:])
        else:
            parts.append(jnp.ones((N, E_.shape[-1]), E_.dtype))
        scalingsT = (D_, jnp.concatenate(parts, axis=0), c_)

    pad_b = (-B) % batch_tile
    if pad_b:
        # Pad the batch by replicating scenario 0; padded rows enter frozen.
        rep = lambda a: jnp.concatenate(
            [a, jnp.broadcast_to(a[..., :1], a.shape[:-1] + (pad_b,))],
            axis=-1,
        )
        qpT = jax.tree_util.tree_map(rep, qpT)
        x0T, y0T = rep(x0T), rep(y0T)
        if scalingsT is not None:
            scalingsT = tuple(rep(s) for s in scalingsT)
    Bp = B + pad_b

    # -- prepare (XLA, batch-LAST) --------------------------------------
    if scalingsT is not None:
        # Precomputed factors (scaling_refresh="tick"): one elementwise
        # scaling pass instead of the Ruiz iteration loop.
        DT, ET, cT = scalingsT
        DT, ET, cT = DT.astype(dtype), ET.astype(dtype), cT.astype(dtype)
        scaled = _apply_scalings_T(qpT, DT, ET, cT, N, w, r, r2)
    else:
        # Ruiz vmapped over the TRAILING batch axis: the scenario batch
        # fills the lanes (same layout as the batch-last derivative layer
        # in stagewise.py); per-element op order matches the per-scenario
        # reference exactly.
        scaled, DT, ET, cT = jax.vmap(
            lambda q_: ruiz_equilibrate_banded(q_, st.scaling_iters),
            in_axes=-1,
            out_axes=-1,
        )(qpT)
    cinv = 1.0 / cT  # (Bp,)
    DinvT, EinvT = 1.0 / DT, 1.0 / ET
    rho0 = _rho_vec(scaled.l, scaled.u, jnp.asarray(st.rho, dtype), dtype)
    # No factorization here: the chunk kernel assembles M and runs the
    # block factorization in-kernel at every entry (a few hundred chained
    # VPU ops), so a rho adaptation refactors by re-entering.  As XLA this
    # stage was a launch-bound sequential scan measured at over half the
    # cart-pole tick (docs/PERFORMANCE.md round-3 bisection).

    HbT, J0T, J1T, JcT = scaled.Hb, scaled.J0, scaled.J1, scaled.Jc
    qT = scaled.q.reshape(N, w, Bp)

    def sections(vT):
        """Flat (rows, Bp) -> per-section views.  Row-major with the batch
        last, so each section is a contiguous slice — pure reshapes, no
        data movement (this is what the old batch-leading carry paid ~9
        relayouts per chunk for)."""
        return (
            vT[:n].reshape(N, w, Bp),
            vT[n : n + nd * r].reshape(nd, r, Bp),
            vT[n + nd * r :].reshape(N, r2, Bp),
        )

    lxT, ldT, lcT = sections(scaled.l)
    uxT, udT, ucT = sections(scaled.u)
    exT, edT, ecT = sections(EinvT)
    dsT = DinvT.reshape(N, w, Bp)
    scaleT = {"ds": dsT, "ex": exT, "ed": edT, "ec": ecT, "ci": cinv}

    if st.adaptive_rho:
        interval = max(st.adaptive_rho_interval, st.check_every)
        interval = (
            (interval + st.check_every - 1) // st.check_every
        ) * st.check_every
    else:
        interval = st.max_iter

    x_s = x0T * DinvT  # scaled warm starts, batch-last flat (n, Bp)
    y_s = cT * y0T * EinvT
    # z initialized ONCE (clip(A x0, l, u) in scaled space) and carried
    # through every chunk — identical to admm_solve_banded's while state.
    # A's x-section is the identity in scaled space (Ex = 1/D pinned);
    # dynamics/stage products accumulate in _apply_A's op order.
    x3 = x_s.reshape(N, w, Bp)
    zx0 = jnp.clip(x3, lxT, uxT)
    zd0 = jnp.clip(
        jnp.sum(J0T * x3[:-1, None, :, :], axis=2)
        + jnp.sum(J1T * x3[1:, None, :, :], axis=2),
        ldT,
        udT,
    )
    zc0 = jnp.clip(jnp.sum(JcT * x3[:, None, :, :], axis=2), lcT, ucT)
    z_s = jnp.concatenate(
        [zx0.reshape(n, Bp), zd0.reshape(nd * r, Bp), zc0.reshape(N * r2, Bp)],
        axis=0,
    )

    # Certificates per scenario over the TRAILING axis (lanes = batch).
    cert_b = jax.vmap(
        lambda qp_, dx, dy, D_, E_, ci_: banded_certificates(
            qp_, dx, dy, D_, E_, ci_, st
        ),
        in_axes=-1,
    )

    false_b = jnp.zeros((Bp,), bool)
    # Padded replicas enter frozen: they never advance, never trip
    # certificates, and never hold the while loop open.
    done0 = false_b if pad_b == 0 else jnp.concatenate(
        [jnp.zeros((B,), bool), jnp.ones((pad_b,), bool)]
    )
    inf_b = jnp.full((Bp,), jnp.inf, dtype)
    state = (
        jnp.zeros((Bp,), jnp.int32),  # it per scenario
        x_s,  # (n, Bp)
        y_s,  # (m, Bp)
        z_s,  # (m, Bp) z (scaled), carried across chunks
        rho0,  # (m, Bp)
        done0,  # done (converged; padded rows pre-frozen)
        false_b,  # prim_inf
        false_b,  # dual_inf
        inf_b,  # r_prim
        inf_b,  # r_dual
    )

    def cond_fn(s):
        it_b, _, _, _, _, done, pinf, dinf, _, _ = s
        active = jnp.logical_and(
            ~(done | pinf | dinf), it_b < st.max_iter
        )
        return jnp.any(active)

    def body_fn(s):
        (it_b, x, y, z, rho, done, pinf, dinf, rp, rd) = s
        stop = done | pinf | dinf
        yx, yd, yc = sections(y)
        zx, zd, zc = sections(z)
        rxT, rdT_, rcT = sections(rho)
        bounds = {
            "lx": lxT, "ux": uxT, "rx": rxT,
            "ld": ldT, "ud": udT, "rd": rdT_,
            "lc": lcT, "uc": ucT, "rc": rcT,
        }
        chunk_fn = (
            banded_admm_chunk_cr if use_cr
            else banded_admm_chunk_rolled if rolled
            else banded_admm_chunk
        )
        (xT2, yx2, yd2, yc2, zx2, zd2, zc2, kdone, it_inc,
         rp_k, rd_k, mp_k, md_k) = chunk_fn(
            it_b, stop.astype(jnp.int32),
            HbT, J0T, J1T, JcT, qT, bounds, scaleT,
            x.reshape(N, w, Bp), yx, yd, yc, zx, zd, zc,
            interval=interval,
            check_every=st.check_every,
            max_iter=st.max_iter,
            sigma=sigma,
            alpha=float(st.alpha),
            eps_abs=float(st.eps_abs),
            eps_rel=float(st.eps_rel),
            batch_tile=batch_tile,
            interpret=interpret,
        )
        x_new = xT2.reshape(n, Bp)
        y_new = jnp.concatenate(
            [yx2.reshape(n, Bp), yd2.reshape(nd * r, Bp),
             yc2.reshape(N * r2, Bp)], axis=0,
        )
        z_new = jnp.concatenate(
            [zx2.reshape(n, Bp), zd2.reshape(nd * r, Bp),
             zc2.reshape(N * r2, Bp)], axis=0,
        )
        ran = jnp.isfinite(rp_k)  # scenarios that advanced this chunk
        it_b = it_b + it_inc
        done = done | ((kdone == 1) & ~stop)
        rp = jnp.where(ran, rp_k, rp)
        rd = jnp.where(ran, rd_k, rd)
        if st.check_infeasibility:
            pinf_k, dinf_k = cert_b(
                scaled, x_new - x, y_new - y, DT, ET, cinv
            )
            pinf = pinf | (pinf_k & ran & ~done)
            dinf = dinf | (dinf_k & ran & ~done)
        if st.adaptive_rho:
            rp_rel = rp_k / jnp.maximum(mp_k, 1e-12)
            rd_rel = rd_k / jnp.maximum(md_k, 1e-12)
            scale = jnp.sqrt(rp_rel / jnp.maximum(rd_rel, 1e-12))
            scale = jnp.clip(scale, 1e-3, 1e3)
            trigger = (
                jnp.logical_or(
                    scale > st.adaptive_rho_tolerance,
                    scale < 1.0 / st.adaptive_rho_tolerance,
                )
                & ran & ~done & ~pinf & ~dinf
            )
            # The refactorization itself happens inside the kernel at the
            # next chunk entry; updating rho here is all the adaptation is.
            rho = jnp.where(
                trigger[None, :],
                jnp.clip(rho * scale[None, :], _RHO_MIN, _RHO_MAX),
                rho,
            )
        return (it_b, x_new, y_new, z_new, rho,
                done, pinf, dinf, rp, rd)

    (it_b, x, y, z, rho, done, pinf, dinf, rp, rd) = (
        jax.lax.while_loop(cond_fn, body_fn, state)
    )

    if st.polish:
        # The polish pass stays batch-leading (vmapped per scenario over
        # dense section math) — transpose at this opt-in boundary only.
        pol = jax.vmap(
            lambda qp_, x_, y_, z_, rp_, rd_, Ei_, Di_, ci_: banded_polish(
                qp_, st, btd_factor, btd_solve,
                x_, y_, z_, rp_, rd_, Ei_, Di_, ci_,
            )
        )
        xb, yb, zb, rp, rd = pol(
            jax.tree_util.tree_map(_ut, scaled),
            x.T, y.T, z.T, rp, rd, EinvT.T, DinvT.T, cinv,
        )
        x, y, z = xb.T, yb.T, zb.T

    return (
        (DT * x)[:, :B],
        _strip_sections_T(ET * y * cinv, N, w, r, r2, had_r, had_r2)[:, :B],
        _strip_sections_T(z * EinvT, N, w, r, r2, had_r, had_r2)[:, :B],
        it_b[:B],
        done[:B],
        rp[:B],
        rd[:B],
        pinf[:B],
        dinf[:B],
    )
