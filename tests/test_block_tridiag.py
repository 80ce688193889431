"""Block-tridiagonal solver vs dense reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optimal_control_problem_tpu.ops.block_tridiag import (
    btd_factor,
    btd_matvec,
    btd_solve,
    dense_to_blocks,
)


def random_btd(seed, N=10, w=4):
    rng = np.random.default_rng(seed)
    diag = []
    lower = []
    for k in range(N):
        L = rng.normal(size=(w, w))
        diag.append(L @ L.T + (2 * w) * np.eye(w))
    for k in range(N - 1):
        lower.append(0.3 * rng.normal(size=(w, w)))
    diag = np.stack(diag).astype(np.float32)
    lower = np.stack(lower).astype(np.float32)
    # dense assembly
    M = np.zeros((N * w, N * w), np.float32)
    for k in range(N):
        M[k * w : (k + 1) * w, k * w : (k + 1) * w] = diag[k]
    for k in range(N - 1):
        M[(k + 1) * w : (k + 2) * w, k * w : (k + 1) * w] = lower[k]
        M[k * w : (k + 1) * w, (k + 1) * w : (k + 2) * w] = lower[k].T
    return diag, lower, M


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("N,w", [(10, 4), (50, 8)])
def test_btd_solve_matches_dense(seed, N, w):
    diag, lower, M = random_btd(seed, N, w)
    rng = np.random.default_rng(seed + 100)
    b = rng.normal(size=(N, w)).astype(np.float32)
    fac = btd_factor(jnp.asarray(diag), jnp.asarray(lower))
    x = btd_solve(fac, jnp.asarray(b))
    x_dense = np.linalg.solve(M.astype(np.float64), b.reshape(-1).astype(np.float64))
    np.testing.assert_allclose(
        np.asarray(x).reshape(-1), x_dense, rtol=2e-3, atol=2e-4
    )


def test_btd_matvec_matches_dense():
    diag, lower, M = random_btd(3, 12, 5)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(12, 5)).astype(np.float32)
    mv = btd_matvec(jnp.asarray(diag), jnp.asarray(lower), jnp.asarray(x))
    ref = (M @ x.reshape(-1)).reshape(12, 5)
    np.testing.assert_allclose(np.asarray(mv), ref, rtol=1e-4, atol=1e-4)


def test_dense_to_blocks_roundtrip():
    diag, lower, M = random_btd(5, 6, 3)
    d2, l2 = dense_to_blocks(jnp.asarray(M), 6, 3)
    np.testing.assert_allclose(np.asarray(d2), diag, atol=1e-6)
    np.testing.assert_allclose(np.asarray(l2), lower, atol=1e-6)


def test_btd_vmap_batches():
    B, N, w = 5, 8, 4
    diags, lowers, Ms, bs = [], [], [], []
    rng = np.random.default_rng(9)
    for s in range(B):
        d, l, M = random_btd(s, N, w)
        diags.append(d), lowers.append(l), Ms.append(M)
        bs.append(rng.normal(size=(N, w)).astype(np.float32))
    solve_b = jax.vmap(lambda d, l, b: btd_solve(btd_factor(d, l), b))
    xs = solve_b(
        jnp.asarray(np.stack(diags)),
        jnp.asarray(np.stack(lowers)),
        jnp.asarray(np.stack(bs)),
    )
    for s in range(B):
        ref = np.linalg.solve(
            Ms[s].astype(np.float64), bs[s].reshape(-1).astype(np.float64)
        )
        np.testing.assert_allclose(
            np.asarray(xs[s]).reshape(-1), ref, rtol=2e-3, atol=2e-4
        )


@pytest.mark.parametrize("N,w", [(8, 4), (10, 3), (33, 5), (50, 8)])
def test_cyclic_reduction_matches_dense(N, w):
    from optimal_control_problem_tpu.ops.block_tridiag import cr_factor, cr_solve

    diag, lower, M = random_btd(7, N, w)
    rng = np.random.default_rng(11)
    b = rng.normal(size=(N, w)).astype(np.float32)
    fac = cr_factor(jnp.asarray(diag), jnp.asarray(lower))
    x = cr_solve(fac, jnp.asarray(b))
    x_dense = np.linalg.solve(
        M.astype(np.float64), b.reshape(-1).astype(np.float64)
    )
    np.testing.assert_allclose(
        np.asarray(x).reshape(-1), x_dense, rtol=3e-3, atol=3e-4
    )


def test_cyclic_reduction_vmap():
    from optimal_control_problem_tpu.ops.block_tridiag import cr_factor, cr_solve

    B, N, w = 4, 16, 4
    rng = np.random.default_rng(12)
    diags, lowers, Ms, bs = [], [], [], []
    for s in range(B):
        d, l, M = random_btd(s + 20, N, w)
        diags.append(d), lowers.append(l), Ms.append(M)
        bs.append(rng.normal(size=(N, w)).astype(np.float32))
    solve_b = jax.vmap(lambda d, l, b: cr_solve(cr_factor(d, l), b))
    xs = solve_b(
        jnp.asarray(np.stack(diags)),
        jnp.asarray(np.stack(lowers)),
        jnp.asarray(np.stack(bs)),
    )
    for s in range(B):
        ref = np.linalg.solve(
            Ms[s].astype(np.float64), bs[s].reshape(-1).astype(np.float64)
        )
        np.testing.assert_allclose(
            np.asarray(xs[s]).reshape(-1), ref, rtol=3e-3, atol=3e-4
        )
