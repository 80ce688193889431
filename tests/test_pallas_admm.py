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
