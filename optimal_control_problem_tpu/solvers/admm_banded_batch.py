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
    _apply_A,
    _rho_vec,
    apply_scalings,
    banded_certificates,
    banded_polish,
    ruiz_equilibrate_banded,
)

__all__ = ["admm_solve_banded_batch", "pick_batch_tile", "ruiz_scalings_batch"]


def ruiz_scalings_batch(qp: BandedQP, iters: int):
    """Batch Ruiz factors only: ``(D (B, n), E (B, m), c (B,))``.

    Batch-LAST vmap (scenarios in lanes) like the driver's own prepare;
    used by the SQP layer to hoist equilibration out of the SQP scan
    (``ADMMSettings.scaling_refresh == "tick"``).
    """
    qpT = jax.tree_util.tree_map(_t, qp)
    _, DT, ET, cT = jax.vmap(
        lambda q_: ruiz_equilibrate_banded(q_, iters),
        in_axes=-1,
        out_axes=-1,
    )(qpT)
    return _ut(DT), _ut(ET), cT


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


def _split_rows(v, N, w, r, r2):
    """(B, m) flat rows [x; dyn; sc] -> per-section (B, ...) arrays."""
    B = v.shape[0]
    n = N * w
    nd = N - 1
    vx = v[:, :n].reshape(B, N, w)
    vd = v[:, n : n + nd * r].reshape(B, nd, r)
    vc = v[:, n + nd * r :].reshape(B, N, r2)
    return vx, vd, vc


def _join_rows(vx, vd, vc):
    B = vx.shape[0]
    return jnp.concatenate(
        [vx.reshape(B, -1), vd.reshape(B, -1), vc.reshape(B, -1)], axis=1
    )


def _t(a):
    """Batch-leading -> batch-last."""
    return jnp.moveaxis(a, 0, -1)


def _ut(a):
    """Batch-last -> batch-leading."""
    return jnp.moveaxis(a, -1, 0)


def _pad_sections(qp: BandedQP, y0, N, w):
    """Ensure r >= 1 and r2 >= 1 by inserting all-zero Jacobian rows with
    loose bounds (the kernel has a fixed three-section signature).  Zero
    rows are inert: Ruiz gives them unit scaling (``_limit_scaling(0) = 1``)
    and their iterates stay exactly zero.  Returns (qp, y0, had_r, had_r2).
    """
    B = qp.Hb.shape[0]
    nd = N - 1
    n = N * w
    r = qp.J0.shape[2]
    r2 = qp.Jc.shape[2]
    had_r, had_r2 = r > 0, r2 > 0
    dtype = qp.Hb.dtype
    l, u, q = qp.l, qp.u, qp.q
    J0, J1, Jc = qp.J0, qp.J1, qp.Jc
    inf = jnp.inf
    if not had_r:
        J0 = jnp.zeros((B, nd, 1, w), dtype)
        J1 = jnp.zeros((B, nd, 1, w), dtype)
        pad = jnp.full((B, nd), -inf, dtype)
        l = jnp.concatenate([l[:, :n], pad, l[:, n:]], axis=1)
        u = jnp.concatenate([u[:, :n], -pad, u[:, n:]], axis=1)
        y0 = jnp.concatenate(
            [y0[:, :n], jnp.zeros((B, nd), dtype), y0[:, n:]], axis=1
        )
    if not had_r2:
        Jc = jnp.zeros((B, N, 1, w), dtype)
        pad = jnp.full((B, N), -inf, dtype)
        l = jnp.concatenate([l, pad], axis=1)
        u = jnp.concatenate([u, -pad], axis=1)
        y0 = jnp.concatenate([y0, jnp.zeros((B, N), dtype)], axis=1)
    return BandedQP(qp.Hb, J0, J1, Jc, q, l, u), y0, had_r, had_r2


def _strip_sections(v, N, w, r, r2, had_r, had_r2):
    """Drop the rows added by :func:`_pad_sections` from a flat (B, m)."""
    if had_r and had_r2:
        return v
    vx, vd, vc = _split_rows(v, N, w, r, r2)
    parts = [vx.reshape(v.shape[0], -1)]
    if had_r:
        parts.append(vd.reshape(v.shape[0], -1))
    if had_r2:
        parts.append(vc.reshape(v.shape[0], -1))
    return jnp.concatenate(parts, axis=1)


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
    """
    st = settings
    dtype = qp.Hb.dtype
    B, N, w = qp.Hb.shape[0], qp.Hb.shape[1], qp.Hb.shape[2]
    if N < 2:
        raise ValueError("batch-native banded path requires horizon >= 2")
    n = N * w
    m_in = qp.l.shape[1]
    sigma = float(st.sigma)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    use_cr = st.banded_solver == "cr"
    if batch_tile is None:
        r_eff = max(qp.J0.shape[2], 1)
        r2_eff = max(qp.Jc.shape[2], 1)
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
        # fall back to the vmapped XLA loop (same semantics).
        from .admm_banded import admm_solve_banded

        return jax.vmap(
            lambda q_, x_, y_: admm_solve_banded(q_, st, x0=x_, y0=y_)
        )(
            qp,
            jnp.zeros((B, n), dtype) if x0 is None else x0,
            jnp.zeros((B, m_in), dtype) if y0 is None else y0,
        )

    qp = qp._replace(
        l=jnp.minimum(qp.l.astype(dtype), qp.u.astype(dtype)),
        u=qp.u.astype(dtype),
        q=qp.q.astype(dtype),
    )
    x0 = jnp.zeros((B, n), dtype) if x0 is None else x0.astype(dtype)
    y0 = jnp.zeros((B, m_in), dtype) if y0 is None else y0.astype(dtype)
    qp, y0, had_r, had_r2 = _pad_sections(qp, y0, N, w)
    r = qp.J0.shape[2]
    r2 = qp.Jc.shape[2]
    m = qp.l.shape[1]
    if scalings is not None and not (had_r and had_r2):
        # Precomputed E was built on the UNPADDED sections; insert unit
        # scalings for the inert rows _pad_sections added (zero Jacobian
        # rows get _limit_scaling(0) = 1 from Ruiz too).
        D_, E_, c_ = scalings
        parts = [E_[:, :n]]
        if had_r:
            parts.append(E_[:, n : n + (N - 1) * r])
            sc_off = n + (N - 1) * r
        else:
            parts.append(jnp.ones((E_.shape[0], N - 1), E_.dtype))
            sc_off = n
        if had_r2:
            parts.append(E_[:, sc_off:])
        else:
            parts.append(jnp.ones((E_.shape[0], N), E_.dtype))
        scalings = (D_, jnp.concatenate(parts, axis=1), c_)

    pad_b = (-B) % batch_tile
    if pad_b:
        # Pad the batch by replicating scenario 0; padded rows enter frozen.
        rep = lambda a: jnp.concatenate(
            [a, jnp.broadcast_to(a[:1], (pad_b,) + a.shape[1:])], axis=0
        )
        qp = jax.tree_util.tree_map(rep, qp)
        x0, y0 = rep(x0), rep(y0)
        if scalings is not None:
            scalings = tuple(rep(s) for s in scalings)
    Bp = B + pad_b

    # -- prepare (XLA, batch-LAST) --------------------------------------
    if scalings is not None:
        # Precomputed factors (scaling_refresh="tick"): one elementwise
        # scaling pass instead of the Ruiz iteration loop.
        D, E, c = scalings
        D, E, c = D.astype(dtype), E.astype(dtype), c.astype(dtype)
        scaled = jax.vmap(apply_scalings)(qp, D, E, c)
    else:
        # Ruiz runs scaling_iters x (rescale blocks + norms) per SQP
        # step; vmapped over a LEADING batch axis every intermediate has
        # w (5..16) in the lanes.  Mapping the batch as the TRAILING axis
        # instead puts the scenario batch in the lanes — the same layout
        # fix as the batch-last derivative layer (stagewise.py).  Same
        # math, same per-element op order; only the vmap axis moves.
        qpT = jax.tree_util.tree_map(lambda a: _t(a), qp)
        scaledT, DT, ET, cT = jax.vmap(
            lambda q_: ruiz_equilibrate_banded(q_, st.scaling_iters),
            in_axes=-1,
            out_axes=-1,
        )(qpT)
        scaled = jax.tree_util.tree_map(lambda a: _ut(a), scaledT)
        D, E, c = _ut(DT), _ut(ET), cT
    cinv = 1.0 / c  # (Bp,)
    Dinv, Einv = 1.0 / D, 1.0 / E
    rho0 = _rho_vec(scaled.l, scaled.u, jnp.asarray(st.rho, dtype), dtype)
    # No factorization here: the chunk kernel assembles M and runs the
    # block-Thomas factorization in-kernel at every entry (a few hundred
    # chained VPU ops), so a rho adaptation refactors by re-entering.  As
    # XLA this stage was a launch-bound sequential scan measured at over
    # half the cart-pole tick (docs/PERFORMANCE.md round-3 bisection).

    # Batch-last constants for the kernel.
    HbT = _t(scaled.Hb)
    J0T, J1T, JcT = _t(scaled.J0), _t(scaled.J1), _t(scaled.Jc)
    qT = _t(scaled.q.reshape(Bp, N, w))

    def sectionsT(v):
        vx, vd, vc = _split_rows(v, N, w, r, r2)
        return _t(vx), _t(vd), _t(vc)

    lxT, ldT, lcT = sectionsT(scaled.l)
    uxT, udT, ucT = sectionsT(scaled.u)
    exT, edT, ecT = sectionsT(Einv)
    dsT = _t(Dinv.reshape(Bp, N, w))
    scaleT = {"ds": dsT, "ex": exT, "ed": edT, "ec": ecT, "ci": cinv}

    if st.adaptive_rho:
        interval = max(st.adaptive_rho_interval, st.check_every)
        interval = (
            (interval + st.check_every - 1) // st.check_every
        ) * st.check_every
    else:
        interval = st.max_iter

    x_s = x0 * Dinv  # scaled warm starts, batch-leading flat
    y_s = c[:, None] * y0 * Einv
    # z initialized ONCE (clip(A x0, l, u) in scaled space) and carried
    # through every chunk — identical to admm_solve_banded's while state.
    z_s = jnp.clip(
        jax.vmap(lambda q_, x_: _apply_A(q_, x_.reshape(N, w)))(scaled, x_s),
        scaled.l,
        scaled.u,
    )

    cert_b = jax.vmap(
        lambda qp_, dx, dy, D_, E_, ci_: banded_certificates(
            qp_, dx, dy, D_, E_, ci_, st
        )
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
        x_s,
        y_s,
        z_s,  # z (scaled), carried across chunks
        rho0,
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
        yx, yd, yc = sectionsT(y)
        zx, zd, zc = sectionsT(z)
        rxT, rdT_, rcT = sectionsT(rho)
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
            _t(x.reshape(Bp, N, w)), yx, yd, yc, zx, zd, zc,
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
        x_new = _ut(xT2).reshape(Bp, n)
        y_new = _join_rows(_ut(yx2), _ut(yd2), _ut(yc2))
        z_new = _join_rows(_ut(zx2), _ut(zd2), _ut(zc2))
        ran = jnp.isfinite(rp_k)  # scenarios that advanced this chunk
        it_b = it_b + it_inc
        done = done | ((kdone == 1) & ~stop)
        rp = jnp.where(ran, rp_k, rp)
        rd = jnp.where(ran, rd_k, rd)
        if st.check_infeasibility:
            pinf_k, dinf_k = cert_b(
                scaled, x_new - x, y_new - y, D, E, cinv
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
                trigger[:, None],
                jnp.clip(rho * scale[:, None], _RHO_MIN, _RHO_MAX),
                rho,
            )
        return (it_b, x_new, y_new, z_new, rho,
                done, pinf, dinf, rp, rd)

    (it_b, x, y, z, rho, done, pinf, dinf, rp, rd) = (
        jax.lax.while_loop(cond_fn, body_fn, state)
    )

    if st.polish:
        pol = jax.vmap(
            lambda qp_, x_, y_, z_, rp_, rd_, Ei_, Di_, ci_: banded_polish(
                qp_, st, btd_factor, btd_solve,
                x_, y_, z_, rp_, rd_, Ei_, Di_, ci_,
            )
        )
        x, y, z, rp, rd = pol(scaled, x, y, z, rp, rd, Einv, Dinv, cinv)

    sol = QPSolution(
        x=(D * x)[:B],
        y=_strip_sections(E * y * cinv[:, None], N, w, r, r2, had_r, had_r2)[:B],
        z=_strip_sections(z * Einv, N, w, r, r2, had_r, had_r2)[:B],
        iters=it_b[:B],
        converged=done[:B],
        r_prim=rp[:B],
        r_dual=rd[:B],
        prim_inf=pinf[:B],
        dual_inf=dinf[:B],
    )
    return sol
