"""Pallas TPU kernel: fused shared-factorization ADMM chunk (dense, MXU).

Why this exists: the shared-system batched ADMM (``solvers/admm_batched.py``)
is the headline throughput path — every iteration is three ``(B,·)@(·,·)``
GEMMs — but as an XLA ``while_loop`` each iteration round-trips the
``(B, n)``/``(B, m)`` iterate panels through HBM (loop state plus
intermediates), which is exactly the memory-roofline bound measured in
docs/PERFORMANCE.md ("Roofline": arithmetic intensity ~15-25 flops/byte vs
the ~80 flops/byte ridge).  This kernel runs the WHOLE rho-constant chunk
(up to a driver-supplied dynamic iteration budget, with OSQP termination
checks every ``check_every``) inside one Pallas program with the panels, the operator,
and the bounds all resident in VMEM — the per-iteration HBM traffic drops
to zero and the loop becomes MXU-bound.

Layout is batch-LEADING (the natural GEMM layout): panels ``(Bt, n)`` /
``(Bt, m)`` with the batch in sublanes and the variable/constraint dims in
lanes; operators ``(n, n)`` / ``(m, n)`` are shared by every scenario in
the batch (that is the whole point of the shared-factorization path).  At
the flagship size (B=4096, n=120, m=196) the full working set is ~50 MB —
VMEM-resident on a v5e (~128 MB), so the batch runs as ONE grid program
with no pipelining at all.

All matmuls run at HIGHEST precision (6 bf16 MXU passes per f32 product):
the solve must be genuinely float32 — see ``solvers/admm.f32_matmuls``.

Semantics per iteration are identical to
``admm_batched._admm_iterate_impl``'s ``one_iter`` (condensed method):
over-relaxed OSQP ADMM with per-row rho shared across the batch, residual
checks every ``check_every`` iterations, and the XLA path's batch-shared
termination — scenarios keep iterating (and ``converged`` is re-evaluated)
until EVERY scenario in the tile is converged.  Infeasibility certificates
and adaptive rho live in the driver between chunks
(``admm_batched.admm_iterate_prepared`` with ``backend="pallas"``), exactly
like the banded chunk family (``ops/banded_kernel.py``).

The reference's analog of this layer is one OSQP-CUDA solve per scenario
per SQP iteration (``sqp_solver/CuCaQP.cpp:271-288``); batching scenarios
through one shared factorization is a capability it does not have.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["shared_admm_chunk", "pick_shared_tile"]

_HI = jax.lax.Precision.HIGHEST
_H3 = jax.lax.Precision.HIGH  # 3-pass bf16 (see ADMMSettings.iter_precision)


def _dot(a, b, prec=_HI):
    """(Bt, k) @ (k, j) on the MXU (f32-HIGHEST unless overridden)."""
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32,
    )


def _dot_t(a, b, prec=_HI):
    """(Bt, k) @ (j, k)^T on the MXU (f32-HIGHEST unless overridden)."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32,
    )


def pick_shared_tile(B: int, n: int, m: int):
    """Batch tile whose chunk working set fits in VMEM, or None.

    Per-scenario VMEM rows (f32, lane dims pad to multiples of 128):
    panels x/q (2 n-rows), z/y/l/u (4 m-rows), plus live loop values and
    temporaries (rhs/xt in n-rows, zt/z_rel/z_new/Ax/Aty and friends in
    m-rows) — modeled at 2x the panel count, consistent with the measured
    value overhead of the banded chunk kernel.  Operators (OP, Pb, Ab, rho)
    are batch-independent and small (<1 MB at flagship sizes).

    The batch block dim lives in SUBLANES here (batch-leading layout), so
    tiles only need to be multiples of 8 — but whole-batch-as-one-program
    is the preferred (and at flagship sizes, actual) configuration.
    """
    pad = lambda s: -(-s // 128) * 128
    np_, mp = pad(n), pad(m)
    per_scen = 3 * (2 * np_ + 4 * mp)  # panels + 2x values/temps
    ops = 2 * n * np_ + m * np_ + 4 * mp + 2 * np_
    budget = 96 * 1024 * 1024 // 4 - ops
    if B * per_scen <= budget:
        return B
    tile = (budget // per_scen) // 8 * 8
    if tile >= 8:
        return min(tile, B)
    return None


def _kernel(
    done0_ref,  # (Bt, 1) int32: 1 = scenario enters converged/certified
    bound_ref,  # (1, 1) int32: iteration budget for this chunk (dynamic)
    op_ref,  # (n, n) condensed operator inverse (shared)
    ab_ref,  # (m, n) scaled constraint matrix (shared)
    pb_ref,  # (n, n) scaled Hessian (shared)
    rho_ref,  # (1, m) per-row rho (shared)
    lb_ref,  # (Bt, m) scaled lower bounds
    ub_ref,  # (Bt, m)
    qb_ref,  # (Bt, n) scaled linear term
    dinv_ref,  # (1, n) 1/D variable unscaling
    einv_ref,  # (1, m) 1/E constraint unscaling
    ci_ref,  # (1, 1) 1/c cost unscaling
    x0_ref,  # (Bt, n) scaled iterates at chunk entry
    z0_ref,  # (Bt, m)
    y0_ref,  # (Bt, m)
    # outputs
    xo_ref,  # (Bt, n)
    zo_ref,  # (Bt, m)
    yo_ref,  # (Bt, m)
    conv_o_ref,  # (Bt, 1) int32
    it_o_ref,  # (Bt, 1) int32 iterations advanced this chunk (tile-uniform)
    rp_o_ref,  # (Bt, 1) unscaled primal residual at last check (inf if none)
    rd_o_ref,  # (Bt, 1)
    rpr_o_ref,  # (Bt, 1) relative primal residual (for driver adaptive rho)
    rdr_o_ref,  # (Bt, 1)
    *,
    check_every: int,
    sigma: float,
    alpha: float,
    eps_abs: float,
    eps_rel: float,
    iter_precision: str = "highest",
):
    OP = op_ref[:]
    Ab = ab_ref[:]
    Pb = pb_ref[:]
    rho = rho_ref[:]  # (1, m) broadcasts over the batch rows
    lb, ub, qb = lb_ref[:], ub_ref[:], qb_ref[:]
    dinv, einv = dinv_ref[:], einv_ref[:]
    ci = ci_ref[0, 0]
    # Dynamic iteration budget: min(next adaptation boundary, remaining
    # max_iter) — the driver computes it, so the loop can neither run past
    # max_iter nor drift off the XLA path's adaptation schedule.
    bound = bound_ref[0, 0]
    skip = jnp.all(done0_ref[:] == 1)

    # Iteration-GEMM precision (ADMMSettings.iter_precision): the residual
    # matvecs below ALWAYS run at HIGHEST, so termination still certifies
    # full-f32 residuals whatever the iteration ran at.
    p_x = _HI if iter_precision == "highest" else _H3
    p_z = _H3 if iter_precision == "high" else _HI

    def one_iter(_, c):
        x, z, y = c
        rhs = sigma * x - qb + _dot(rho * z - y, Ab, p_x)
        xt = _dot(rhs, OP, p_x)
        zt = _dot_t(xt, Ab, p_z)
        x_n = alpha * xt + (1.0 - alpha) * x
        z_rel = alpha * zt + (1.0 - alpha) * z
        z_n = jnp.clip(z_rel + y / rho, lb, ub)
        y_n = y + rho * (z_rel - z_n)
        return (x_n, z_n, y_n)

    def rowmax(a):
        return jnp.max(a, axis=1, keepdims=True)  # (Bt, 1)

    def residuals(x, z, y):
        Ax = _dot_t(x, Ab)
        Px = _dot(x, Pb)  # Pb symmetric
        Aty = _dot(y, Ab)
        r_prim = rowmax(jnp.abs((Ax - z) * einv))
        r_dual = ci * rowmax(jnp.abs((Px + qb + Aty) * dinv))
        max_prim = jnp.maximum(
            rowmax(jnp.abs(Ax * einv)), rowmax(jnp.abs(z * einv))
        )
        max_dual = ci * jnp.maximum(
            jnp.maximum(
                rowmax(jnp.abs(Aty * dinv)), rowmax(jnp.abs(Px * dinv))
            ),
            rowmax(jnp.abs(qb * dinv)),
        )
        return r_prim, r_dual, max_prim, max_dual

    x, z, y = x0_ref[:], z0_ref[:], y0_ref[:]
    Bt = x.shape[0]
    inf_col = jnp.full((Bt, 1), jnp.inf, x.dtype)
    zero_i = jnp.zeros((Bt, 1), jnp.int32)

    def cond(state):
        k, _, _, _, all_conv = state[:5]
        return jnp.logical_and(
            k < bound, jnp.logical_not(jnp.logical_or(all_conv, skip))
        )

    def body(state):
        k, x, z, y, _, conv, it_inc, rp, rd, rpr, rdr = state
        x, z, y = jax.lax.fori_loop(0, check_every, one_iter, (x, z, y))
        r_prim, r_dual, max_prim, max_dual = residuals(x, z, y)
        eps_pri = eps_abs + eps_rel * max_prim
        eps_dua = eps_abs + eps_rel * max_dual
        # Batch-shared termination like the XLA path: conv is re-evaluated
        # for EVERY scenario each block; nobody freezes.
        conv = jnp.logical_and(r_prim <= eps_pri, r_dual <= eps_dua)
        rpr = r_prim / jnp.maximum(max_prim, 1e-12)
        rdr = r_dual / jnp.maximum(max_dual, 1e-12)
        return (
            k + check_every, x, z, y, jnp.all(conv),
            conv.astype(jnp.int32), it_inc + check_every,
            r_prim, r_dual, rpr, rdr,
        )

    state = (
        jnp.int32(0), x, z, y, jnp.asarray(False),
        done0_ref[:], zero_i, inf_col, inf_col, inf_col, inf_col,
    )
    (_, x, z, y, _, conv, it_inc, rp, rd, rpr, rdr) = jax.lax.while_loop(
        cond, body, state
    )

    xo_ref[:], zo_ref[:], yo_ref[:] = x, z, y
    conv_o_ref[:] = conv
    it_o_ref[:] = it_inc
    rp_o_ref[:], rd_o_ref[:] = rp, rd
    rpr_o_ref[:], rdr_o_ref[:] = rpr, rdr


@partial(
    jax.jit,
    static_argnames=(
        "check_every", "sigma", "alpha",
        "eps_abs", "eps_rel", "batch_tile", "interpret", "iter_precision",
    ),
)
def shared_admm_chunk(
    done0,  # (B,) bool/int32: scenario enters converged/certified
    bound,  # scalar int32: iteration budget for this chunk (traced)
    OP,  # (n, n)
    Ab,  # (m, n)
    Pb,  # (n, n)
    rho,  # (m,)
    lb,  # (B, m)
    ub,  # (B, m)
    qb,  # (B, n)
    Dinv,  # (n,)
    Einv,  # (m,)
    cinv,  # scalar
    x,  # (B, n)
    z,  # (B, m)
    y,  # (B, m)
    *,
    check_every: int,
    sigma: float,
    alpha: float,
    eps_abs: float,
    eps_rel: float,
    batch_tile: int,
    interpret: bool = False,
    iter_precision: str = "highest",
):
    """Run one rho-constant shared-system ADMM chunk fully in VMEM.

    Returns ``(x, z, y, conv, it_inc, rp, rd, rp_rel, rd_rel)`` — panels
    with leading batch dim, per-scenario columns flattened to ``(B,)``.
    The grid splits the batch into ``batch_tile``-scenario programs; each
    program owns the shared operator plus its panel tile in VMEM for the
    whole chunk.  A tile whose scenarios are all done at entry exits
    immediately (outputs = inputs, ``it_inc`` = 0).
    """
    B = x.shape[0]
    if B % batch_tile:
        raise ValueError(f"batch {B} not divisible by tile {batch_tile}")
    grid = (B // batch_tile,)
    dtype = x.dtype
    n = x.shape[1]
    m = z.shape[1]

    def tile_spec(cols):
        return pl.BlockSpec(
            (batch_tile, cols), lambda i: (i, 0),
            pipeline_mode=pl.Buffered(buffer_count=1),
        )

    def full_spec(a):
        return pl.BlockSpec(
            a.shape, lambda i: (0,) * a.ndim,
            pipeline_mode=pl.Buffered(buffer_count=1),
        )

    inputs = [
        done0.astype(jnp.int32)[:, None],
        jnp.asarray(bound, jnp.int32).reshape(1, 1),
        OP, Ab, Pb, rho[None, :],
        lb, ub, qb,
        Dinv[None, :], Einv[None, :],
        jnp.asarray(cinv, dtype).reshape(1, 1),
        x, z, y,
    ]
    in_specs = [
        tile_spec(1),
        full_spec(jnp.zeros((1, 1), jnp.int32)),
        full_spec(OP), full_spec(Ab), full_spec(Pb), full_spec(rho[None, :]),
        tile_spec(m), tile_spec(m), tile_spec(n),
        full_spec(Dinv[None, :]), full_spec(Einv[None, :]),
        full_spec(jnp.zeros((1, 1), dtype)),
        tile_spec(n), tile_spec(m), tile_spec(m),
    ]
    out_shapes = (
        jax.ShapeDtypeStruct((B, n), dtype),  # x
        jax.ShapeDtypeStruct((B, m), dtype),  # z
        jax.ShapeDtypeStruct((B, m), dtype),  # y
        jax.ShapeDtypeStruct((B, 1), jnp.int32),  # conv
        jax.ShapeDtypeStruct((B, 1), jnp.int32),  # it_inc
        jax.ShapeDtypeStruct((B, 1), dtype),  # rp
        jax.ShapeDtypeStruct((B, 1), dtype),  # rd
        jax.ShapeDtypeStruct((B, 1), dtype),  # rp_rel
        jax.ShapeDtypeStruct((B, 1), dtype),  # rd_rel
    )
    out_specs = tuple(tile_spec(s.shape[1]) for s in out_shapes)
    kernel = partial(
        _kernel,
        check_every=check_every,
        sigma=sigma,
        alpha=alpha,
        eps_abs=eps_abs,
        eps_rel=eps_rel,
        iter_precision=iter_precision,
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=out_shapes,
        in_specs=in_specs,
        out_specs=out_specs,
        # v5e has ~128 MB of physical VMEM (probed; see ops/banded_kernel).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*inputs)
    x, z, y, conv, it_inc, rp, rd, rpr, rdr = outs
    return (
        x, z, y,
        conv[:, 0].astype(bool), it_inc[:, 0],
        rp[:, 0], rd[:, 0], rpr[:, 0], rdr[:, 0],
    )
