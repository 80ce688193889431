"""Pallas TPU kernel: one complete OSQP-style ADMM solve in VMEM.

Motivation (the per-scenario hot path): for nonlinear models each scenario
carries its OWN factorized operator ``OP`` (the local QP changes with the
iterate), so the XLA while-loop implementation in ``solvers/admm.py`` must
re-stream ``OP`` (n^2 floats) and ``A`` (m*n floats) from HBM on EVERY ADMM
iteration — hundreds of passes over the same bytes.  This kernel pins the
operator in VMEM once and runs the entire iteration loop (with on-device
termination checks) before touching HBM again, turning an HBM-bandwidth-bound
loop into a compute-bound one.

Batching: ``jax.vmap`` of the wrapped call adds a grid dimension, so a batch
of B scenarios becomes a B-program grid, each program owning one scenario's
operator — double-buffered by the Pallas pipeline.

The algorithm is identical to ``solvers/admm.py`` post-scaling (over-relaxed
ADMM, per-row rho, OSQP termination on unscaled residuals); inputs are the
already-equilibrated quantities, so the two implementations share the
prepare stage bit-for-bit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["admm_device_loop"]


def _kernel(
    # inputs (VMEM unless noted)
    op_ref,  # (n, n) condensed inverse
    ab_ref,  # (m, n) scaled A
    abt_ref,  # (n, m) scaled A^T (prematerialized)
    pb_ref,  # (n, n) scaled P (for dual residuals)
    qb_ref,  # (1, n)
    lb_ref,  # (1, m)
    ub_ref,  # (1, m)
    rho_ref,  # (1, m)
    dinv_ref,  # (1, n) 1/D
    einv_ref,  # (1, m) 1/E
    scal_ref,  # (1, 4) [sigma, alpha, cinv, eps_abs] packed scalars
    eps_ref,  # (1, 1) eps_rel
    x0_ref,  # (1, n)
    y0_ref,  # (1, m)
    # outputs
    xo_ref,  # (1, n)
    yo_ref,  # (1, m)
    zo_ref,  # (1, m)
    it_ref,  # (1, 128) int32; [0, 0] holds the iteration count
    *,
    max_iter: int,
    check_every: int,
):
    sigma = scal_ref[0, 0]
    alpha = scal_ref[0, 1]
    cinv = scal_ref[0, 2]
    eps_abs = scal_ref[0, 3]
    eps_rel = eps_ref[0, 0]

    op = op_ref[:]
    ab = ab_ref[:]
    abt = abt_ref[:]
    pb = pb_ref[:]
    qb = qb_ref[:]
    lb = lb_ref[:]
    ub = ub_ref[:]
    rho = rho_ref[:]
    dinv = dinv_ref[:]
    einv = einv_ref[:]

    x = x0_ref[:]
    y = y0_ref[:]
    z = jnp.clip(
        jnp.dot(x, abt, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST), lb, ub
    )

    def one_iter(carry):
        x, z, y = carry
        t = rho * z - y
        rhs = sigma * x - qb + jnp.dot(t, ab, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        xt = jnp.dot(rhs, op, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        zt = jnp.dot(xt, abt, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        x_new = alpha * xt + (1.0 - alpha) * x
        z_rel = alpha * zt + (1.0 - alpha) * z
        z_new = jnp.clip(z_rel + y / rho, lb, ub)
        y_new = y + rho * (z_rel - z_new)
        return x_new, z_new, y_new

    def chunk(carry):
        def body(_, c):
            return one_iter(c)

        return jax.lax.fori_loop(0, check_every, body, carry)

    def residual_ok(x, z, y):
        ax = jnp.dot(x, abt, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        px = jnp.dot(x, pb, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        aty = jnp.dot(y, ab, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        r_prim = jnp.max(jnp.abs((ax - z) * einv))
        r_dual = cinv * jnp.max(jnp.abs((px + qb + aty) * dinv))
        max_prim = jnp.maximum(
            jnp.max(jnp.abs(ax * einv)), jnp.max(jnp.abs(z * einv))
        )
        max_dual = cinv * jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(aty * dinv)), jnp.max(jnp.abs(px * dinv))),
            jnp.max(jnp.abs(qb * dinv)),
        )
        eps_pri = eps_abs + eps_rel * max_prim
        eps_dua = eps_abs + eps_rel * max_dual
        return jnp.logical_and(r_prim <= eps_pri, r_dual <= eps_dua)

    def cond(state):
        it, x, z, y, done = state
        return jnp.logical_and(it < max_iter, jnp.logical_not(done))

    def body(state):
        it, x, z, y, done = state
        x, z, y = chunk((x, z, y))
        done = residual_ok(x, z, y)
        return it + check_every, x, z, y, done

    it, x, z, y, done = jax.lax.while_loop(
        cond, body, (jnp.int32(0), x, z, y, jnp.asarray(False))
    )
    xo_ref[:] = x
    yo_ref[:] = y
    zo_ref[:] = z
    # Iteration count as a lane-aligned VMEM row (scalar stores target SMEM,
    # but SMEM outputs do not batch under vmap's added grid dimension).
    it_ref[:] = jnp.full((1, 128), it, jnp.int32)


@partial(
    jax.jit,
    static_argnames=("max_iter", "check_every", "interpret"),
)
def admm_device_loop(
    OP,  # (n, n) condensed inverse (scaled space)
    Ab,  # (m, n)
    Pb,  # (n, n)
    qb,  # (n,)
    lb,  # (m,)
    ub,  # (m,)
    rho_v,  # (m,)
    Dinv,  # (n,)
    Einv,  # (m,)
    cinv,  # scalar
    sigma: float,
    alpha: float,
    eps_abs: float,
    eps_rel: float,
    x0,  # (n,) scaled warm start
    y0,  # (m,) scaled warm start
    max_iter: int = 10000,
    check_every: int = 25,
    interpret: bool = False,
):
    """Run the in-VMEM ADMM loop; returns (x, y, z, iters) in SCALED space.

    All inputs are the post-equilibration quantities produced by
    ``solvers/admm.py``'s prepare stage (condensed method).  ``jax.vmap``
    over the leading axis of every operand batches scenarios into a grid.
    """
    n = OP.shape[0]
    m = Ab.shape[0]
    dtype = OP.dtype

    scalars = jnp.stack(
        [
            jnp.asarray(sigma, dtype),
            jnp.asarray(alpha, dtype),
            jnp.asarray(cinv, dtype),
            jnp.asarray(eps_abs, dtype),
        ]
    ).reshape(1, 4)
    eps = jnp.asarray(eps_rel, dtype).reshape(1, 1)

    kernel = partial(_kernel, max_iter=max_iter, check_every=check_every)
    vspec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    x, y, z, it = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, n), dtype),
            jax.ShapeDtypeStruct((1, m), dtype),
            jax.ShapeDtypeStruct((1, m), dtype),
            jax.ShapeDtypeStruct((1, 128), jnp.int32),
        ),
        in_specs=[vspec() for _ in range(14)],
        out_specs=(vspec(), vspec(), vspec(), vspec()),
        # v5e has ~128 MB of physical VMEM (probed; see ops/banded_kernel);
        # the 16 MB default is only XLA's scoped-vmem guard.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        OP,
        Ab,
        Ab.T,
        Pb,
        qb.reshape(1, n),
        lb.reshape(1, m),
        ub.reshape(1, m),
        rho_v.reshape(1, m),
        Dinv.reshape(1, n),
        Einv.reshape(1, m),
        scalars,
        eps,
        x0.reshape(1, n),
        y0.reshape(1, m),
    )
    return x.reshape(n), y.reshape(m), z.reshape(m), it[0, 0]
