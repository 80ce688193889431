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

__all__ = [
    "BTDFactor",
    "btd_factor",
    "btd_solve",
    "btd_matvec",
    "dense_to_blocks",
    "small_spd_inv",
]


def small_spd_inv(a: jnp.ndarray) -> jnp.ndarray:
    """Batched inverse of small SPD blocks ``(..., w, w)`` without pivoting.

    ``jnp.linalg.inv`` lowers to LU with partial pivoting, which XLA:TPU
    executes as a sequential row loop with dynamic slices — measured
    ~7 ms for (5120, 5, 5) f32 on v5e, ~100x the arithmetic cost, and the
    single dominant term of the whole banded prepare stage.  The pivot
    blocks here are SPD by construction (Ruiz-equilibrated
    ``P + sigma I + A^T rho A`` Schur complements), so diagonal pivoting
    is numerically sound and Gauss-Jordan can be fully unrolled over the
    (static, tiny) block width: ``w`` steps of rank-1 broadcast updates,
    vectorized over every leading batch dim — pure VPU work, no gathers,
    no sequential loop.
    """
    w = a.shape[-1]
    if w == 0:
        return a
    if w == 1:
        return 1.0 / a
    if w > 32:  # not "small": generic LU wins asymptotically
        return jnp.linalg.inv(a)
    eye = jnp.eye(w, dtype=a.dtype)
    m = a
    inv = jnp.broadcast_to(eye, a.shape)
    for k in range(w):
        piv = m[..., k : k + 1, k : k + 1]  # (..., 1, 1)
        mrow = m[..., k : k + 1, :] / piv  # (..., 1, w)
        irow = inv[..., k : k + 1, :] / piv
        col = m[..., :, k : k + 1] * (1.0 - eye[:, k : k + 1])  # row k zeroed
        m = m - col * mrow  # rank-1 broadcast update
        inv = inv - col * irow
        rowmask = eye[k][:, None]  # (w, 1): select row k
        m = m * (1.0 - rowmask) + rowmask * mrow
        inv = inv * (1.0 - rowmask) + rowmask * irow
    return inv


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

    # Small blocks: a fixed chain of slice-based adds — the exact
    # association order of the fused chunk kernel's in-kernel
    # factorization (ops/banded_kernel.py prologue), minimizing the fp
    # drift between the two paths' factors (cross-program fusion still
    # differs in FMA formation, so agreement is to roundoff, not bitwise).
    # Large blocks (w > 8, e.g. quadrotor w=16, never on the fused kernel
    # path): plain dots — the add chain measured ~1.5x slower there.
    if w <= 8:

        def _mm(a, b):
            acc = None
            for j in range(w):
                t = a[:, j : j + 1] * b[j : j + 1, :]
                acc = t if acc is None else acc + t
            return acc

        def _mm_t(a, b):
            acc = None
            for j in range(w):
                t = a[:, j : j + 1] * b[:, j : j + 1].reshape(1, w)
                acc = t if acc is None else acc + t
            return acc

    else:
        _mm = lambda a, b: a @ b
        _mm_t = lambda a, b: a @ b.T

    def step(carry, inputs):
        prev_dinv = carry
        d_k, a_km1 = inputs  # a_km1 = lower[k-1]
        g_k = _mm(a_km1, prev_dinv)
        schur = d_k - _mm_t(g_k, a_km1)
        dinv_k = small_spd_inv(schur)
        return dinv_k, (dinv_k, g_k)

    d0inv = small_spd_inv(diag[0])
    _, (dinv_rest, g) = jax.lax.scan(step, d0inv, (diag[1:], lower))
    dinv = jnp.concatenate([d0inv[None], dinv_rest], axis=0)
    return BTDFactor(dinv=dinv, g=g, lower=lower)


@f32_matmuls
def btd_solve(fac: BTDFactor, b: jnp.ndarray) -> jnp.ndarray:
    """Solve M x = b given the factorization.  ``b``: (N, w) -> (N, w).

    Block "matvecs" are broadcast-multiply-reduce, NOT dots: at w <= 16
    the MXU is useless, and this is the exact op sequence of the fused
    Pallas chunk's in-kernel sweep (ops/banded_kernel.py ``btd_solve``) so
    the two paths' iterates bit-match (dots accumulate with FMAs and
    drift in the last ulp).
    """
    dinv, g, _ = fac

    # Forward: y_k = b_k - G_k y_{k-1}
    def fwd(y_prev, inputs):
        b_k, g_k = inputs
        y_k = b_k - jnp.sum(g_k * y_prev[None, :], axis=1)
        return y_k, y_k

    y0 = b[0]
    _, y_rest = jax.lax.scan(fwd, y0, (b[1:], g))
    y = jnp.concatenate([y0[None], y_rest], axis=0)

    # Backward: x_N = Dinv_N y_N; x_k = Dinv_k y_k - G_{k+1}^T x_{k+1}
    def bwd(x_next, inputs):
        y_k, dinv_k, g_k1 = inputs
        x_k = jnp.sum(dinv_k * y_k[None, :], axis=1) - jnp.sum(
            g_k1 * x_next[:, None], axis=0
        )
        return x_k, x_k

    x_last = jnp.sum(dinv[-1] * y[-1][None, :], axis=1)
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


# ----------------------------------------------------------------------
# Cyclic reduction: log-depth block-tridiagonal solve.
#
# Block-Thomas (above) is O(N) sequential depth — right for large batches
# where every scan step is a full batch of block ops.  Odd-even cyclic
# reduction eliminates all odd stages simultaneously at each of log2(N)
# levels, so the sequential depth is ~2 log2(N): the right shape for
# latency-critical small batches and the building block for horizon-axis
# sharding across ICI neighbors (each level's eliminations are independent
# -> shard stages over devices, exchange boundary blocks).

@jax.tree_util.register_pytree_node_class
class CRFactor:
    """Per-level precomputed elimination operators.

    ``levels``: tuple over levels of
    ``(G_lo, G_hi, dinv_odd)`` where for each even-survivor j of that level
    ``G_lo = L_j D_{j-1}^{-1}`` (coupling to the lower odd neighbor),
    ``G_hi = L_{j+1}^T D_{j+1}^{-1}`` (upper odd neighbor), and
    ``dinv_odd`` are the inverses of the eliminated odd pivots;
    ``root_dinv``: inverse of the final 1-block system;
    ``n_orig``: original stage count before padding — static pytree aux
    data, so a CRFactor can ride jit/while_loop/cond boundaries (the level
    count and padding are shape-determining).
    """

    def __init__(self, levels, root_dinv, n_orig):
        self.levels = levels
        self.root_dinv = root_dinv
        self.n_orig = n_orig

    def tree_flatten(self):
        return (self.levels, self.root_dinv), self.n_orig

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux)


def _pad_pow2(diag, lower):
    N, w, _ = diag.shape
    N2 = 1 << max(1, (N - 1).bit_length())
    if N2 == N:
        return diag, lower
    eye = jnp.broadcast_to(jnp.eye(w, dtype=diag.dtype), (N2 - N, w, w))
    diag = jnp.concatenate([diag, eye], axis=0)
    zeros = jnp.zeros((N2 - 1 - lower.shape[0], w, w), diag.dtype)
    lower = jnp.concatenate([lower, zeros], axis=0)
    return diag, lower


@f32_matmuls
def cr_factor(diag: jnp.ndarray, lower: jnp.ndarray) -> CRFactor:
    """Precompute cyclic-reduction elimination operators.

    ``diag``: (N, w, w); ``lower``: (N-1, w, w).  N is padded to a power of
    two with identity blocks.
    """
    n_orig = diag.shape[0]
    diag, lower = _pad_pow2(diag, lower)
    N, w, _ = diag.shape
    # Use a uniform representation: L[k] couples stage k to k-1, L[0] = 0.
    L = jnp.concatenate([jnp.zeros((1, w, w), diag.dtype), lower], axis=0)

    levels = []
    while N > 1:
        odd_d = diag[1::2]  # (N/2, w, w) pivots to eliminate
        dinv_odd = small_spd_inv(odd_d)
        even_d = diag[0::2]
        # For even survivor j (global 2i): lower odd neighbor 2i-1, upper
        # odd neighbor 2i+1.
        L_from_lower = L[0::2]  # couples 2i -> 2i-1
        L_to_upper = L[1::2]  # couples 2i+1 -> 2i  (use transpose upward)
        dinv_lo = jnp.concatenate(
            [jnp.zeros((1, w, w), diag.dtype), dinv_odd[:-1]], axis=0
        )
        G_lo = jnp.einsum("kij,kjl->kil", L_from_lower, dinv_lo)
        G_hi = jnp.einsum("kji,kjl->kil", L_to_upper, dinv_odd)
        new_diag = (
            even_d
            - jnp.einsum("kij,klj->kil", G_lo, L_from_lower)
            - jnp.einsum("kij,kjl->kil", G_hi, L_to_upper)
        )
        # New subdiagonal: survivor 2i couples to 2i-2 through odd 2i-1:
        # L'_i = -G_lo[i] @ L[2i-1] (L[odd] couples 2i-1 -> 2i-2).
        L_odd = L[1::2]
        new_L = -jnp.einsum(
            "kij,kjl->kil", G_lo[1:], L_odd[:-1]
        )
        new_L = jnp.concatenate(
            [jnp.zeros((1, w, w), diag.dtype), new_L], axis=0
        )
        levels.append((G_lo, G_hi, dinv_odd, L_odd, L_from_lower, L_to_upper))
        diag, L = new_diag, new_L
        N //= 2

    root_dinv = small_spd_inv(diag[0])
    return CRFactor(levels=tuple(levels), root_dinv=root_dinv, n_orig=n_orig)


@f32_matmuls
def cr_solve(fac: CRFactor, b: jnp.ndarray) -> jnp.ndarray:
    """Solve M x = b with precomputed cyclic-reduction factors.  b: (N, w)."""
    n_orig = fac.n_orig
    w = b.shape[1]
    N2 = 1 << max(1, (n_orig - 1).bit_length())
    if N2 != n_orig:
        b = jnp.concatenate(
            [b, jnp.zeros((N2 - n_orig, w), b.dtype)], axis=0
        )

    # Down-sweep: fold odd rhs into even survivors.
    rhs_stack = []
    for G_lo, G_hi, dinv_odd, L_odd, L_lo, L_up in fac.levels:
        b_even = b[0::2]
        b_odd = b[1::2]
        b_odd_lo = jnp.concatenate(
            [jnp.zeros((1, w), b.dtype), b_odd[:-1]], axis=0
        )
        b_new = (
            b_even
            - jnp.einsum("kij,kj->ki", G_lo, b_odd_lo)
            - jnp.einsum("kij,kj->ki", G_hi, b_odd)
        )
        rhs_stack.append(b_odd)
        b = b_new

    x = jnp.einsum("ij,j->i", fac.root_dinv, b[0])[None, :]

    # Up-sweep: recover odd unknowns at each level.
    for (G_lo, G_hi, dinv_odd, L_odd, L_lo, L_up), b_odd in zip(
        reversed(fac.levels), reversed(rhs_stack)
    ):
        # x currently holds the even survivors of this level.
        x_even = x
        # odd i (global 2i+1): D x = b_odd - L_odd x_{2i} - L_up^T... the
        # row of odd stage couples to even neighbors 2i and 2i+2:
        # L[2i+1] x_{2i} + D x + L[2i+2]^T x_{2i+2} = b_odd.
        x_lo = x_even
        x_hi = jnp.concatenate(
            [x_even[1:], jnp.zeros((1, w), x.dtype)], axis=0
        )
        L_next = jnp.concatenate(
            [L_lo[1:], jnp.zeros((1, w, w), x.dtype)], axis=0
        )
        rhs = (
            b_odd
            - jnp.einsum("kij,kj->ki", L_odd, x_lo)
            - jnp.einsum("kji,kj->ki", L_next, x_hi)
        )
        x_odd = jnp.einsum("kij,kj->ki", dinv_odd, rhs)
        # Interleave even/odd back to this level's full ordering.
        n_level = x_even.shape[0] + x_odd.shape[0]
        x = jnp.zeros((n_level, w), x.dtype)
        x = x.at[0::2].set(x_even)
        x = x.at[1::2].set(x_odd)

    return x[:n_orig]


@f32_matmuls
def btd_solve_mat(fac: BTDFactor, B: jnp.ndarray) -> jnp.ndarray:
    """Solve M X = B with block rhs.  ``B``: (N, w, k) -> (N, w, k)."""
    dinv, g, _ = fac

    def fwd(y_prev, inputs):
        b_k, g_k = inputs
        y_k = b_k - g_k @ y_prev
        return y_k, y_k

    y0 = B[0]
    _, y_rest = jax.lax.scan(fwd, y0, (B[1:], g))
    y = jnp.concatenate([y0[None], y_rest], axis=0)

    def bwd(x_next, inputs):
        y_k, dinv_k, g_k1 = inputs
        x_k = dinv_k @ y_k - g_k1.T @ x_next
        return x_k, x_k

    x_last = dinv[-1] @ y[-1]
    _, x_rest = jax.lax.scan(bwd, x_last, (y[:-1], dinv[:-1], g), reverse=True)
    return jnp.concatenate([x_rest, x_last[None]], axis=0)
