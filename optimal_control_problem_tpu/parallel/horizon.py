"""Horizon-axis sharding: distributed block-tridiagonal KKT solve.

The reference keeps the whole horizon in one flat vector on one device
(``OCPConfig.cpp:102``); SURVEY.md section 2 calls out horizon/sequence
parallelism as a required new capability — the OCP analog of context
parallelism.  This module shards the *horizon* (stage) axis of the
block-tridiagonal KKT operator across a mesh axis and solves with the
Schur-complement partition method (SPIKE):

1. each device owns a contiguous chunk of ``C = N / D`` stages and
   eliminates its interior exactly with a local block-LDL^T
   (``ops/block_tridiag``), producing its chunk's response to the two
   interface unknowns (its left neighbor's last stage and right neighbor's
   first stage);
2. the per-chunk interface data (2 vectors + 4 small coupling blocks per
   device) is ``all_gather``-ed over the mesh axis — the only collective,
   sized O(D * w^2), riding ICI;
3. the reduced interface system (2 D w unknowns) is solved replicated, and
   each device reconstructs its interior locally.

Exact (no iteration): the reduced system is the exact Schur complement of
the interior elimination.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.block_tridiag import btd_factor, btd_solve, btd_solve_mat
from ..solvers.admm import f32_matmuls

__all__ = ["horizon_sharded_solve"]


def _local_interface_data(diag_l, lower_l, next_L, b_l, is_first, is_last):
    """Eliminate this chunk's interior; return interface responses.

    ``diag_l``: (C, w, w); ``lower_l``: (C, w, w) where row k couples local
    stage k to its predecessor (row 0 couples to the LEFT NEIGHBOR's last
    stage); ``next_L``: (w, w) the right neighbor's row-0 coupling block
    (this chunk's last stage -> neighbor's first stage, transposed side);
    ``b_l``: (C, w).

    Returns ``v`` (C, w) = M_loc^{-1} b, and ``WL``/``WR`` (C, w, w) =
    M_loc^{-1} applied to the left/right coupling columns.
    """
    C, w, _ = diag_l.shape
    fac = btd_factor(diag_l, lower_l[1:])
    v = btd_solve(fac, b_l)

    L0 = jnp.where(is_first, jnp.zeros((w, w), diag_l.dtype), lower_l[0])
    BL = jnp.zeros((C, w, w), diag_l.dtype).at[0].set(L0)
    Ln = jnp.where(is_last, jnp.zeros((w, w), diag_l.dtype), next_L)
    BR = jnp.zeros((C, w, w), diag_l.dtype).at[-1].set(Ln.T)
    WL = btd_solve_mat(fac, BL)
    WR = btd_solve_mat(fac, BR)
    return fac, v, WL, WR


def horizon_sharded_solve(
    diag: jnp.ndarray,  # (N, w, w) diagonal blocks (global)
    lower: jnp.ndarray,  # (N, w, w): row k couples stage k to k-1; row 0 zero
    b: jnp.ndarray,  # (N, w)
    *,
    mesh: Mesh,
    axis: str = "h",
):
    """Solve the SPD block-tridiagonal system with stages sharded over
    ``mesh[axis]``.  ``N`` must be divisible by the axis size, with at least
    two stages per device."""
    N, w, _ = diag.shape
    D = mesh.shape[axis]
    C = N // D
    if C * D != N or C < 2:
        raise ValueError(
            f"horizon {N} must split into >=2 stages per device over {D}"
        )

    def body(diag_l, lower_l, b_l):
        d = jax.lax.axis_index(axis)
        is_first = d == 0
        is_last = d == D - 1
        # Right neighbor's row-0 coupling block via a left-shift permute.
        next_L = jax.lax.ppermute(
            lower_l[0], axis, [(i, (i - 1) % D) for i in range(D)]
        )
        fac, v, WL, WR = _local_interface_data(
            diag_l, lower_l, next_L, b_l, is_first, is_last
        )

        # Interface quantities of every chunk, gathered everywhere
        # (the only collective: O(D * w^2) over ICI).
        g = lambda t: jax.lax.all_gather(t, axis)  # (D, ...)
        v0, v1 = g(v[0]), g(v[-1])
        WL0, WL1 = g(WL[0]), g(WL[-1])
        WR0, WR1 = g(WR[0]), g(WR[-1])

        # Reduced system over u = [f_0, l_0, f_1, l_1, ...] (2D blocks):
        #   f_d + WL0_d l_{d-1} + WR0_d f_{d+1} = v0_d
        #   l_d + WL1_d l_{d-1} + WR1_d f_{d+1} = v1_d
        nred = 2 * D * w
        K = jnp.eye(nred, dtype=diag.dtype)
        rhs = jnp.zeros((nred,), diag.dtype)
        # D is static (mesh shape), so assemble with a Python loop.
        for dd in range(D):
            rf = 2 * dd * w  # row/col offset of f_dd
            rl = rf + w  # of l_dd
            if dd > 0:
                cl = (2 * (dd - 1) + 1) * w  # column of l_{dd-1}
                K = K.at[rf : rf + w, cl : cl + w].add(WL0[dd])
                K = K.at[rl : rl + w, cl : cl + w].add(WL1[dd])
            if dd < D - 1:
                cf = 2 * (dd + 1) * w  # column of f_{dd+1}
                K = K.at[rf : rf + w, cf : cf + w].add(WR0[dd])
                K = K.at[rl : rl + w, cf : cf + w].add(WR1[dd])
            rhs = rhs.at[rf : rf + w].set(v0[dd])
            rhs = rhs.at[rl : rl + w].set(v1[dd])
        u = jnp.linalg.solve(K, rhs)  # replicated small solve

        # This chunk's neighbors' interface values.
        l_prev = jax.lax.dynamic_slice(
            u, ((2 * ((d - 1) % D) + 1) * w,), (w,)
        )
        l_prev = jnp.where(is_first, jnp.zeros((w,), u.dtype), l_prev)
        f_next = jax.lax.dynamic_slice(u, ((2 * ((d + 1) % D)) * w,), (w,))
        f_next = jnp.where(is_last, jnp.zeros((w,), u.dtype), f_next)

        x_l = (
            v
            - jnp.einsum("kij,j->ki", WL, l_prev)
            - jnp.einsum("kij,j->ki", WR, f_next)
        )
        return x_l

    shard = NamedSharding(mesh, P(axis))
    diag = jax.device_put(diag, shard)
    lower = jax.device_put(lower, shard)
    b = jax.device_put(b, shard)
    solve = jax.jit(
        f32_matmuls(
            jax.shard_map(
                body,
                mesh=mesh,
                in_specs=(P(axis), P(axis), P(axis)),
                out_specs=P(axis),
            )
        )
    )
    return solve(diag, lower, b)
