"""Horizon-axis sharded KKT solve (SPIKE partition method) on the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optimal_control_problem_tpu.parallel import make_mesh
from optimal_control_problem_tpu.parallel.horizon import horizon_sharded_solve


def random_system(seed, N, w):
    rng = np.random.default_rng(seed)
    diag = np.stack(
        [
            (lambda L: L @ L.T + (2 * w) * np.eye(w))(rng.normal(size=(w, w)))
            for _ in range(N)
        ]
    ).astype(np.float32)
    lower = np.zeros((N, w, w), np.float32)
    lower[1:] = 0.4 * rng.normal(size=(N - 1, w, w))
    M = np.zeros((N * w, N * w), np.float32)
    for k in range(N):
        M[k * w : (k + 1) * w, k * w : (k + 1) * w] = diag[k]
    for k in range(1, N):
        M[k * w : (k + 1) * w, (k - 1) * w : k * w] = lower[k]
        M[(k - 1) * w : k * w, k * w : (k + 1) * w] = lower[k].T
    b = rng.normal(size=(N, w)).astype(np.float32)
    return diag, lower, b, M


@pytest.mark.parametrize("N,w", [(16, 4), (32, 3), (64, 5)])
def test_sharded_solve_matches_dense(N, w):
    mesh = make_mesh(("h",))
    assert mesh.shape["h"] == 8
    diag, lower, b, M = random_system(0, N, w)
    x = horizon_sharded_solve(
        jnp.asarray(diag), jnp.asarray(lower), jnp.asarray(b), mesh=mesh, axis="h"
    )
    ref = np.linalg.solve(M.astype(np.float64), b.reshape(-1).astype(np.float64))
    np.testing.assert_allclose(
        np.asarray(x).reshape(-1), ref, rtol=3e-3, atol=3e-4
    )


def test_sharded_solve_rejects_bad_split():
    mesh = make_mesh(("h",))
    diag, lower, b, _ = random_system(1, 12, 3)  # 12 not divisible by 8
    with pytest.raises(ValueError, match="split"):
        horizon_sharded_solve(
            jnp.asarray(diag), jnp.asarray(lower), jnp.asarray(b),
            mesh=mesh, axis="h",
        )
