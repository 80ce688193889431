"""Tests for the OSQP-style ADMM QP solver."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import minimize, LinearConstraint

from optimal_control_problem_tpu.solvers.admm import (
    ADMMSettings,
    admm_solve,
    ruiz_equilibrate,
)

# Tighter than the production 1e-3 (SQPOptimizationSolver.cpp:83-84) but
# within float32 reach.
SET = ADMMSettings(eps_abs=1e-4, eps_rel=1e-4)


def scipy_qp(P, q, A, l, u):
    """Ground-truth QP via scipy (f64, tight tolerance)."""
    n = P.shape[0]
    cons = [LinearConstraint(A, l, u)] if A.shape[0] else []
    res = minimize(
        lambda x: 0.5 * x @ P @ x + q @ x,
        np.zeros(n),
        jac=lambda x: P @ x + q,
        hess=lambda x: P,
        constraints=cons,
        method="trust-constr",
        options={"maxiter": 2000, "gtol": 1e-10, "xtol": 1e-12},
    )
    assert res.status in (1, 2), res.message
    return res.x


def run(P, q, A, l, u, settings=SET, **kw):
    return admm_solve(
        jnp.asarray(P, jnp.float32),
        jnp.asarray(q, jnp.float32),
        jnp.asarray(A, jnp.float32),
        jnp.asarray(l, jnp.float32),
        jnp.asarray(u, jnp.float32),
        settings,
        **kw,
    )


def test_equality_qp():
    # min x^2 + y^2 s.t. x + y = 1 -> (0.5, 0.5)
    P = 2 * np.eye(2)
    q = np.zeros(2)
    A = np.array([[1.0, 1.0]])
    sol = run(P, q, A, np.array([1.0]), np.array([1.0]))
    assert bool(sol.converged)
    np.testing.assert_allclose(sol.x, [0.5, 0.5], atol=1e-3)


def test_box_qp():
    # min (x-3)^2 + (y-4)^2 with x in [0,2], y in [0,3] -> (2, 3)
    P = 2 * np.eye(2)
    q = np.array([-6.0, -8.0])
    A = np.eye(2)
    sol = run(P, q, A, np.zeros(2), np.array([2.0, 3.0]))
    assert bool(sol.converged)
    np.testing.assert_allclose(sol.x, [2.0, 3.0], atol=1e-3)


def test_inactive_inequality():
    # min (x-2)^2 + (y-3)^2 s.t. x + y >= 1 -> (2, 3)
    P = 2 * np.eye(2)
    q = np.array([-4.0, -6.0])
    A = np.array([[1.0, 1.0]])
    sol = run(P, q, A, np.array([1.0]), np.array([np.inf]))
    assert bool(sol.converged)
    np.testing.assert_allclose(sol.x, [2.0, 3.0], atol=1e-3)


def test_loose_bounds_rows():
    # rows with (-inf, inf) bounds must not perturb the solution
    P = 2 * np.eye(2)
    q = np.array([-2.0, -2.0])
    A = np.vstack([np.eye(2), [[1.0, -1.0]]])
    l = np.array([-np.inf, -np.inf, -np.inf])
    u = np.array([np.inf, np.inf, np.inf])
    sol = run(P, q, A, l, u)
    assert bool(sol.converged)
    np.testing.assert_allclose(sol.x, [1.0, 1.0], atol=1e-3)


@pytest.mark.parametrize("method", ["kkt", "condensed"])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_convex_qp_vs_scipy(seed, method):
    rng = np.random.default_rng(seed)
    n, m = 8, 12
    L = rng.normal(size=(n, n))
    P = L @ L.T + 0.1 * np.eye(n)
    q = rng.normal(size=n)
    A = rng.normal(size=(m, n))
    # Guarantee a feasible region around a random point.
    x_feas = rng.normal(size=n)
    center = A @ x_feas
    l = center - rng.uniform(0.1, 2.0, size=m)
    u = center + rng.uniform(0.1, 2.0, size=m)
    x_ref = scipy_qp(P, q, A, l, u)
    sol = run(P, q, A, l, u, SET.replace(method=method))
    assert bool(sol.converged)
    np.testing.assert_allclose(sol.x, x_ref, atol=5e-3)


def test_badly_scaled_qp():
    # Ruiz equilibration should handle 1e4 scale spread.
    P = np.diag([1e4, 1e-2])
    q = np.array([-1e4, 1e-2])
    A = np.array([[1e3, 0.0], [0.0, 1e-2]])
    l = np.array([-1e3, -1.0])
    u = np.array([1e3, 1.0])
    x_ref = scipy_qp(P, q, A, l, u)
    sol = run(P, q, A, l, u)
    assert bool(sol.converged)
    # OSQP termination is *relative* (eps_rel scaled by the 1e4-magnitude
    # data), so assert relative accuracy.
    np.testing.assert_allclose(sol.x, x_ref, rtol=5e-2, atol=1e-3)


def test_warm_start_reduces_iterations():
    rng = np.random.default_rng(3)
    n, m = 10, 14
    L = rng.normal(size=(n, n))
    P = L @ L.T + 0.5 * np.eye(n)
    q = rng.normal(size=n)
    A = rng.normal(size=(m, n))
    l = -np.ones(m)
    u = np.ones(m)
    cold = run(P, q, A, l, u)
    warm = run(P, q, A, l, u, x0=cold.x, y0=cold.y)
    assert int(warm.iters) <= int(cold.iters)


def test_vmap_batching():
    rng = np.random.default_rng(4)
    B, n, m = 16, 6, 8
    Ls = rng.normal(size=(B, n, n))
    Ps = np.einsum("bij,bkj->bik", Ls, Ls) + 0.3 * np.eye(n)
    qs = rng.normal(size=(B, n))
    As = rng.normal(size=(B, m, n))
    ls = -np.ones((B, m))
    us = np.ones((B, m))

    batched = jax.vmap(
        lambda P, q, A, l, u: admm_solve(P, q, A, l, u, SET)
    )
    sols = batched(
        jnp.asarray(Ps, jnp.float32),
        jnp.asarray(qs, jnp.float32),
        jnp.asarray(As, jnp.float32),
        jnp.asarray(ls, jnp.float32),
        jnp.asarray(us, jnp.float32),
    )
    assert bool(jnp.all(sols.converged))
    for b in range(0, B, 5):
        x_ref = scipy_qp(Ps[b], qs[b], As[b], ls[b], us[b])
        np.testing.assert_allclose(sols.x[b], x_ref, atol=5e-3)


def test_ruiz_equilibration_improves_conditioning():
    P = np.diag([1e6, 1.0]).astype(np.float32)
    q = np.zeros(2, np.float32)
    A = np.eye(2, dtype=np.float32)
    Pb, qb, Ab, D, E, c = ruiz_equilibrate(
        jnp.asarray(P), jnp.asarray(q), jnp.asarray(A), 10
    )
    ratio_before = 1e6
    diag = np.abs(np.diag(np.asarray(Pb)))
    ratio_after = diag.max() / max(diag.min(), 1e-12)
    assert ratio_after < ratio_before / 100


def test_indefinite_P_kkt_method():
    # Non-convex QP (reference test case 8 uses an indefinite objective):
    # the quasi-definite KKT formulation must still produce iterates that
    # satisfy the constraints.
    P = np.diag([2.0, -2.0])
    q = np.zeros(2)
    A = np.eye(2)
    l = np.array([-1.0, -1.0])
    u = np.array([1.0, 1.0])
    sol = run(P, q, A, l, u, SET.replace(max_iter=2000))
    x = np.asarray(sol.x)
    assert np.all(x >= l - 1e-2) and np.all(x <= u + 1e-2)


@pytest.mark.parametrize("seed", [0, 1])
def test_polish_improves_accuracy(seed):
    """OSQP-style polishing reaches well beyond the 1e-3 ADMM tolerance."""
    rng = np.random.default_rng(seed)
    n, m = 8, 12
    L = rng.normal(size=(n, n))
    P = L @ L.T + 0.5 * np.eye(n)
    q = rng.normal(size=n)
    A = rng.normal(size=(m, n))
    x_feas = rng.normal(size=n)
    c = A @ x_feas
    l = c - rng.uniform(0.2, 1.5, size=m)
    u = c + rng.uniform(0.2, 1.5, size=m)
    x_ref = scipy_qp(P, q, A, l, u)

    plain = run(P, q, A, l, u, SET.replace(method="kkt"))
    polished = run(P, q, A, l, u, SET.replace(method="kkt", polish=True))
    assert bool(polished.converged)
    err_plain = np.abs(np.asarray(plain.x) - x_ref).max()
    err_pol = np.abs(np.asarray(polished.x) - x_ref).max()
    assert err_pol <= max(err_plain, 1e-4)
    np.testing.assert_allclose(polished.x, x_ref, atol=5e-4)


def test_unconstrained_qp_m0():
    """m = 0 (no constraint rows at all) must solve to the stationary point."""
    P = np.diag([2.0, 4.0])
    q = np.array([-2.0, -8.0])
    A = np.zeros((0, 2))
    sol = run(P, q, A, np.zeros(0), np.zeros(0))
    assert bool(sol.converged)
    np.testing.assert_allclose(sol.x, [1.0, 2.0], atol=1e-3)


def test_infeasible_qp_certificate():
    """Contradictory equality rows: primal-infeasibility certificate.

    OSQP semantics (auxil.c is_primal_infeasible): the delta-y direction
    certifies infeasibility, the solve stops early, and converged stays
    False.
    """
    P = 2 * np.eye(2)
    q = np.zeros(2)
    A = np.array([[1.0, 1.0], [1.0, 1.0]])
    l = np.array([1.0, 3.0])  # x+y == 1 AND x+y == 3
    u = np.array([1.0, 3.0])
    sol = run(P, q, A, l, u, SET.replace(max_iter=500))
    assert not bool(sol.converged)
    assert bool(sol.prim_inf)
    assert not bool(sol.dual_inf)
    assert int(sol.iters) < 500  # early exit on certificate


def test_infeasible_box_qp_certificate():
    """Disjoint box rows (x >= 1 and x <= 0) are primal infeasible."""
    P = np.eye(1)
    q = np.zeros(1)
    A = np.array([[1.0], [1.0]])
    l = np.array([1.0, -np.inf])
    u = np.array([np.inf, 0.0])
    sol = run(P, q, A, l, u, SET.replace(max_iter=2000))
    assert not bool(sol.converged)
    assert bool(sol.prim_inf)


def test_unbounded_qp_dual_certificate():
    """min -x s.t. x >= 0 is unbounded: dual-infeasibility certificate."""
    P = np.zeros((1, 1))
    q = np.array([-1.0])
    A = np.array([[1.0]])
    l = np.array([0.0])
    u = np.array([np.inf])
    sol = run(P, q, A, l, u, SET.replace(max_iter=2000))
    assert not bool(sol.converged)
    assert bool(sol.dual_inf)
    assert not bool(sol.prim_inf)


def test_feasible_qp_no_false_certificates():
    """A plainly solvable QP must not trip either certificate."""
    P = 2 * np.eye(2)
    q = np.array([-2.0, -2.0])
    A = np.eye(2)
    l = np.zeros(2)
    u = np.full(2, 10.0)
    sol = run(P, q, A, l, u, SET)
    assert bool(sol.converged)
    assert not bool(sol.prim_inf)
    assert not bool(sol.dual_inf)
