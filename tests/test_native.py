"""Cross-check the runtime-compiled C++ reference ADMM against the JAX ADMM.

Exercises the compile-and-load workflow (the analog of the reference's
``compileLibrary`` + dlopen, OptimalControlProblem.cpp:602-640) and validates
that two independent implementations of the same OSQP-style algorithm agree.
"""

import numpy as np
import pytest

from optimal_control_problem_tpu.solvers.native import (
    native_admm_solve,
    native_available,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain available"
)


def jax_solve(P, q, A, l, u, **kw):
    import jax.numpy as jnp

    from optimal_control_problem_tpu.solvers.admm import ADMMSettings, admm_solve

    settings = ADMMSettings(
        eps_abs=kw.get("eps_abs", 1e-4),
        eps_rel=kw.get("eps_rel", 1e-4),
        method="condensed",
        adaptive_rho=False,
    )
    return admm_solve(
        jnp.asarray(P, jnp.float32),
        jnp.asarray(q, jnp.float32),
        jnp.asarray(A, jnp.float32),
        jnp.asarray(l, jnp.float32),
        jnp.asarray(u, jnp.float32),
        settings,
    )


@pytest.mark.parametrize("seed", [0, 1])
def test_native_matches_jax_on_random_qps(seed):
    rng = np.random.default_rng(seed)
    n, m = 6, 9
    L = rng.normal(size=(n, n))
    P = L @ L.T + 0.5 * np.eye(n)
    q = rng.normal(size=n)
    A = rng.normal(size=(m, n))
    x_feas = rng.normal(size=n)
    c = A @ x_feas
    l = c - rng.uniform(0.2, 1.5, size=m)
    u = c + rng.uniform(0.2, 1.5, size=m)

    nat = native_admm_solve(P, q, A, l, u, eps_abs=1e-4, eps_rel=1e-4)
    assert nat.converged
    jx = jax_solve(P, q, A, l, u)
    assert bool(jx.converged)
    np.testing.assert_allclose(nat.x, np.asarray(jx.x), atol=5e-3)


def test_native_equality_qp():
    P = 2 * np.eye(2)
    q = np.zeros(2)
    A = np.array([[1.0, 1.0]])
    sol = native_admm_solve(P, q, A, np.array([1.0]), np.array([1.0]))
    assert sol.converged
    np.testing.assert_allclose(sol.x, [0.5, 0.5], atol=1e-3)


def test_native_box_and_inf_bounds():
    P = 2 * np.eye(2)
    q = np.array([-6.0, -8.0])
    A = np.vstack([np.eye(2), [[1.0, -1.0]]])
    l = np.array([0.0, 0.0, -np.inf])
    u = np.array([2.0, 3.0, np.inf])
    sol = native_admm_solve(P, q, A, l, u)
    assert sol.converged
    np.testing.assert_allclose(sol.x, [2.0, 3.0], atol=1e-3)
