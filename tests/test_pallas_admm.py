"""Pallas fused ADMM kernel vs the XLA while-loop reference implementation.

On CPU the kernel runs in interpret mode (the fake-backend mechanism); on
TPU the same code compiles to a single in-VMEM device loop.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optimal_control_problem_tpu.solvers.admm import ADMMSettings, admm_solve

XLA = ADMMSettings(
    eps_abs=1e-4,
    eps_rel=1e-4,
    method="condensed",
    adaptive_rho=False,
    backend="xla",
)
PALLAS = XLA.replace(backend="pallas")


def random_qp(seed, n=8, m=12):
    rng = np.random.default_rng(seed)
    L = rng.normal(size=(n, n))
    P = (L @ L.T + 0.5 * np.eye(n)).astype(np.float32)
    q = rng.normal(size=n).astype(np.float32)
    A = rng.normal(size=(m, n)).astype(np.float32)
    x_feas = rng.normal(size=n)
    c = A @ x_feas
    l = (c - rng.uniform(0.2, 1.5, size=m)).astype(np.float32)
    u = (c + rng.uniform(0.2, 1.5, size=m)).astype(np.float32)
    return P, q, A, l, u


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pallas_matches_xla(seed):
    P, q, A, l, u = random_qp(seed)
    ref = admm_solve(*map(jnp.asarray, (P, q, A, l, u)), XLA)
    ker = admm_solve(*map(jnp.asarray, (P, q, A, l, u)), PALLAS)
    assert bool(ref.converged) and bool(ker.converged)
    np.testing.assert_allclose(np.asarray(ker.x), np.asarray(ref.x), atol=2e-3)
    # Same algorithm, same chunked termination: iteration counts agree.
    assert int(ker.iters) == int(ref.iters)


def test_pallas_with_inf_bounds_and_equalities():
    P = (2 * np.eye(3)).astype(np.float32)
    q = np.array([-2.0, 0.0, 1.0], np.float32)
    A = np.vstack([np.eye(3), [[1.0, 1.0, 1.0]]]).astype(np.float32)
    l = np.array([0.5, -np.inf, -1.0, 1.0], np.float32)
    u = np.array([0.5, np.inf, 1.0, 1.0], np.float32)
    ref = admm_solve(*map(jnp.asarray, (P, q, A, l, u)), XLA)
    ker = admm_solve(*map(jnp.asarray, (P, q, A, l, u)), PALLAS)
    assert bool(ker.converged)
    np.testing.assert_allclose(np.asarray(ker.x), np.asarray(ref.x), atol=2e-3)


def test_pallas_vmap_batches():
    Ps, qs, As, ls, us = [], [], [], [], []
    for seed in range(4):
        P, q, A, l, u = random_qp(seed)
        Ps.append(P), qs.append(q), As.append(A), ls.append(l), us.append(u)
    stack = lambda xs: jnp.asarray(np.stack(xs))
    batched = jax.vmap(lambda P, q, A, l, u: admm_solve(P, q, A, l, u, PALLAS))
    sols = batched(stack(Ps), stack(qs), stack(As), stack(ls), stack(us))
    for b in range(4):
        ref = admm_solve(
            *map(jnp.asarray, (Ps[b], qs[b], As[b], ls[b], us[b])), XLA
        )
        np.testing.assert_allclose(
            np.asarray(sols.x[b]), np.asarray(ref.x), atol=2e-3
        )


def test_pallas_requires_condensed():
    P, q, A, l, u = random_qp(0)
    with pytest.raises(ValueError, match="condensed"):
        admm_solve(
            *map(jnp.asarray, (P, q, A, l, u)),
            XLA.replace(backend="pallas", method="kkt"),
        )


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_adaptive_rho_matches_xla(seed):
    """Chunked kernel re-entry with rho refactorization between chunks:
    same OSQP adapt-every-interval semantics as the XLA loop."""
    st_xla = XLA.replace(adaptive_rho=True, adaptive_rho_interval=50)
    st_pal = st_xla.replace(backend="pallas")
    P, q, A, l, u = random_qp(seed)
    # Badly scaled rho start so adaptation actually triggers.
    st_xla = st_xla.replace(rho=1e-4)
    st_pal = st_pal.replace(rho=1e-4)
    ref = admm_solve(*map(jnp.asarray, (P, q, A, l, u)), st_xla)
    ker = admm_solve(*map(jnp.asarray, (P, q, A, l, u)), st_pal)
    assert bool(ref.converged) and bool(ker.converged)
    np.testing.assert_allclose(np.asarray(ker.x), np.asarray(ref.x), atol=2e-3)
    # Real residuals are now reported for the pallas path too.
    assert np.isfinite(float(ker.r_prim)) and np.isfinite(float(ker.r_dual))


def test_pallas_infeasible_qp_certificate():
    """The chunked driver surfaces primal-infeasibility certificates."""
    P = (2 * np.eye(2)).astype(np.float32)
    q = np.zeros(2, np.float32)
    A = np.array([[1.0, 1.0], [1.0, 1.0]], np.float32)
    l = np.array([1.0, 3.0], np.float32)
    u = np.array([1.0, 3.0], np.float32)
    sol = admm_solve(
        *map(jnp.asarray, (P, q, A, l, u)),
        PALLAS.replace(max_iter=500),
    )
    assert not bool(sol.converged)
    assert bool(sol.prim_inf)
