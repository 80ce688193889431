"""Block-tridiagonal symmetric positive-definite solver (Riccati-style).

The condensed ADMM operator ``M = P + sigma*I + A^T R A`` of a
horizon-structured OCP is block-tridiagonal: stage costs make ``P``
block-diagonal per frame and the dynamics equality rows couple only
consecutive frames (SURVEY.md section 5, "long-context" analog; the reference
never exploits this — its flat vector goes through OSQP's generic sparse LDL,
``OCPConfig.cpp:102``).

For long horizons this matters twice over:

* **memory** — per-scenario dense inverses are O(N^2 w^2) and explode for
  horizon-100 models (quadrotor: n=1600 -> 10 MB *per scenario*); the block
  factorization is O(N w^2);
* **flops** — factorization drops from O(N^3 w^3) to O(N w^3).

The factorization is a block LDL^T (block-Thomas) computed with ``lax.scan``
over stages; each scan step is a batch of small dense ops, so under ``vmap``
every step processes the whole scenario batch at once — sequential in the
horizon, parallel in the batch, which is the right trade for batched MPC.
(A cyclic-reduction variant with log-depth is the planned upgrade for
latency-critical single-scenario use and for horizon-axis sharding over ICI.)

All solves run at HIGHEST matmul precision (see ``solvers/admm.f32_matmuls``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..solvers.admm import f32_matmuls

__all__ = ["BTDFactor", "btd_factor", "btd_solve", "btd_matvec", "dense_to_blocks"]


class BTDFactor(NamedTuple):
    """Block LDL^T factors: M = L D L^T with unit-block-lower L.

    ``dinv``: (N, w, w) inverses of the pivot blocks D_k;
    ``g``: (N-1, w, w) subdiagonal multipliers L_{k+1,k} = A_k D_k^{-1}.
    """

    dinv: jnp.ndarray
    g: jnp.ndarray
    lower: jnp.ndarray  # (N-1, w, w) original subdiagonal blocks A_k


@f32_matmuls
def btd_factor(diag: jnp.ndarray, lower: jnp.ndarray) -> BTDFactor:
    """Factor an SPD block-tridiagonal matrix.

    ``diag``: (N, w, w) diagonal blocks; ``lower``: (N-1, w, w) subdiagonal
    blocks (block (k+1, k)).
    """
    N, w, _ = diag.shape

    def step(carry, inputs):
        prev_dinv = carry
        d_k, a_km1 = inputs  # a_km1 = lower[k-1]
        g_k = a_km1 @ prev_dinv
        schur = d_k - g_k @ a_km1.T
        dinv_k = jnp.linalg.inv(schur)
        return dinv_k, (dinv_k, g_k)

    d0inv = jnp.linalg.inv(diag[0])
    _, (dinv_rest, g) = jax.lax.scan(step, d0inv, (diag[1:], lower))
    dinv = jnp.concatenate([d0inv[None], dinv_rest], axis=0)
    return BTDFactor(dinv=dinv, g=g, lower=lower)


@f32_matmuls
def btd_solve(fac: BTDFactor, b: jnp.ndarray) -> jnp.ndarray:
    """Solve M x = b given the factorization.  ``b``: (N, w) -> (N, w)."""
    dinv, g, _ = fac

    # Forward: y_k = b_k - G_k y_{k-1}
    def fwd(y_prev, inputs):
        b_k, g_k = inputs
        y_k = b_k - g_k @ y_prev
        return y_k, y_k

    y0 = b[0]
    _, y_rest = jax.lax.scan(fwd, y0, (b[1:], g))
    y = jnp.concatenate([y0[None], y_rest], axis=0)

    # Backward: x_N = Dinv_N y_N; x_k = Dinv_k y_k - G_{k+1}^T x_{k+1}
    def bwd(x_next, inputs):
        y_k, dinv_k, g_k1 = inputs
        x_k = dinv_k @ y_k - g_k1.T @ x_next
        return x_k, x_k

    x_last = dinv[-1] @ y[-1]
    _, x_rest = jax.lax.scan(
        bwd, x_last, (y[:-1], dinv[:-1], g), reverse=True
    )
    return jnp.concatenate([x_rest, x_last[None]], axis=0)


@f32_matmuls
def btd_matvec(diag: jnp.ndarray, lower: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """M @ x for a block-tridiagonal M.  ``x``: (N, w)."""
    out = jnp.einsum("kij,kj->ki", diag, x)
    out = out.at[1:].add(jnp.einsum("kij,kj->ki", lower, x[:-1]))
    out = out.at[:-1].add(jnp.einsum("kji,kj->ki", lower, x[1:]))
    return out


def dense_to_blocks(M: jnp.ndarray, N: int, w: int):
    """Extract (diag, lower) blocks from a dense block-tridiagonal matrix."""
    Mb = M.reshape(N, w, N, w)
    diag = jnp.stack([Mb[k, :, k, :] for k in range(N)])
    lower = jnp.stack([Mb[k + 1, :, k, :] for k in range(N - 1)])
    return diag, lower
