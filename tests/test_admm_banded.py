"""Banded (block-tridiagonal) ADMM vs the dense solver on the same QP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optimal_control_problem_tpu.solvers.admm import ADMMSettings, admm_solve
from optimal_control_problem_tpu.solvers.admm_banded import (
    BandedQP,
    admm_solve_banded,
)

# The banded path skips Ruiz scaling; compare against the dense solver with
# scaling disabled so both run the identical algorithm.
SET = ADMMSettings(
    eps_abs=1e-4,
    eps_rel=1e-4,
    method="condensed",
    scaling_iters=0,
    adaptive_rho=True,
)


def random_stage_qp(seed, N=6, w=4, r=3, r2=1):
    rng = np.random.default_rng(seed)
    Hb = []
    for _ in range(N):
        L = rng.normal(size=(w, w))
        Hb.append(L @ L.T + 2 * np.eye(w))
    Hb = np.stack(Hb).astype(np.float32)
    J0 = (0.5 * rng.normal(size=(N - 1, r, w))).astype(np.float32)
    J1 = (0.5 * rng.normal(size=(N - 1, r, w))).astype(np.float32)
    Jc = (0.5 * rng.normal(size=(N, r2, w))).astype(np.float32)
    n = N * w
    q = rng.normal(size=n).astype(np.float32)
    # Bounds: x rows boxed, dynamics rows equality at 0, sc rows one-sided.
    l = np.concatenate(
        [
            np.full(n, -2.0),
            np.zeros((N - 1) * r),
            np.full(N * r2, -1.0),
        ]
    ).astype(np.float32)
    u = np.concatenate(
        [
            np.full(n, 2.0),
            np.zeros((N - 1) * r),
            np.full(N * r2, np.inf),
        ]
    ).astype(np.float32)
    return BandedQP(
        Hb=jnp.asarray(Hb),
        J0=jnp.asarray(J0),
        J1=jnp.asarray(J1),
        Jc=jnp.asarray(Jc),
        q=jnp.asarray(q),
        l=jnp.asarray(l),
        u=jnp.asarray(u),
    )


def dense_equivalent(qp: BandedQP):
    N, w = qp.Hb.shape[0], qp.Hb.shape[1]
    r = qp.J0.shape[1]
    r2 = qp.Jc.shape[1]
    n = N * w
    P = np.zeros((n, n), np.float32)
    for k in range(N):
        P[k * w : (k + 1) * w, k * w : (k + 1) * w] = np.asarray(qp.Hb[k])
    rows = [np.eye(n, dtype=np.float32)]
    if r:
        Ad = np.zeros(((N - 1) * r, n), np.float32)
        for k in range(N - 1):
            Ad[k * r : (k + 1) * r, k * w : (k + 1) * w] = np.asarray(qp.J0[k])
            Ad[k * r : (k + 1) * r, (k + 1) * w : (k + 2) * w] = np.asarray(
                qp.J1[k]
            )
        rows.append(Ad)
    if r2:
        Ac = np.zeros((N * r2, n), np.float32)
        for k in range(N):
            Ac[k * r2 : (k + 1) * r2, k * w : (k + 1) * w] = np.asarray(qp.Jc[k])
        rows.append(Ac)
    A = np.concatenate(rows, axis=0)
    return P, A


@pytest.mark.parametrize("seed", [0, 1])
def test_banded_matches_dense(seed):
    qp = random_stage_qp(seed)
    P, A = dense_equivalent(qp)
    dense = admm_solve(
        jnp.asarray(P), qp.q, jnp.asarray(A), qp.l, qp.u, SET
    )
    banded = admm_solve_banded(qp, SET)
    assert bool(dense.converged) and bool(banded.converged)
    np.testing.assert_allclose(
        np.asarray(banded.x), np.asarray(dense.x), atol=5e-3
    )


def test_banded_no_stage_constraints():
    qp = random_stage_qp(2, r2=0)
    P, A = dense_equivalent(qp)
    dense = admm_solve(jnp.asarray(P), qp.q, jnp.asarray(A), qp.l, qp.u, SET)
    banded = admm_solve_banded(qp, SET)
    assert bool(banded.converged)
    np.testing.assert_allclose(
        np.asarray(banded.x), np.asarray(dense.x), atol=5e-3
    )


def test_banded_vmap():
    qps = [random_stage_qp(s) for s in range(3)]
    stacked = BandedQP(*[jnp.stack([getattr(q, f) for q in qps]) for f in qps[0]._fields])
    sols = jax.vmap(lambda qp: admm_solve_banded(qp, SET))(stacked)
    for b in range(3):
        single = admm_solve_banded(qps[b], SET)
        np.testing.assert_allclose(
            np.asarray(sols.x[b]), np.asarray(single.x), atol=1e-4
        )


@pytest.mark.parametrize("seed", [0, 3])
def test_banded_ruiz_matches_dense_ruiz(seed):
    """With scaling ON both solvers run the identical OSQP algorithm."""
    qp = random_stage_qp(seed)
    P, A = dense_equivalent(qp)
    st = SET.replace(scaling_iters=10)
    dense = admm_solve(jnp.asarray(P), qp.q, jnp.asarray(A), qp.l, qp.u, st)
    banded = admm_solve_banded(qp, st)
    assert bool(dense.converged) and bool(banded.converged)
    np.testing.assert_allclose(
        np.asarray(banded.x), np.asarray(dense.x), atol=5e-3
    )


def test_banded_ruiz_scaling_factors_match_dense():
    """The structured Ruiz factors equal the dense ones on the same QP."""
    from optimal_control_problem_tpu.solvers.admm import ruiz_equilibrate
    from optimal_control_problem_tpu.solvers.admm_banded import (
        ruiz_equilibrate_banded,
    )

    qp = random_stage_qp(5)
    P, A = dense_equivalent(qp)
    n = qp.q.shape[0]
    _, _, _, D_d, E_d, c_d = ruiz_equilibrate(
        jnp.asarray(P), qp.q, jnp.asarray(A), 10
    )
    _, D_b, E_b, c_b = ruiz_equilibrate_banded(qp, 10)
    np.testing.assert_allclose(np.asarray(D_b), np.asarray(D_d), rtol=1e-4)
    # x-section rows: the structured path PINS Ex = 1/D exactly (the
    # solvers hardcode the scaled identity section of A as I, which is
    # only correct at the Ex*D == 1 fixed point); the dense path keeps
    # the Ruiz iterate, which lands ~5e-4 away.  Exact invariant here,
    # dense-agreement on the remaining (general) rows.
    np.testing.assert_allclose(
        np.asarray(E_b[:n] * D_b), np.ones(n, np.float32), rtol=2e-7
    )
    np.testing.assert_allclose(
        np.asarray(E_b[:n]), np.asarray(E_d[:n]), rtol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(E_b[n:]), np.asarray(E_d[n:]), rtol=1e-4
    )
    np.testing.assert_allclose(float(c_b), float(c_d), rtol=1e-4)


def test_banded_ruiz_badly_scaled_qp_matches_dense():
    """A QP with 1e5 dynamic range across stages: the scaled banded solve
    must converge and agree with the scaled dense solve."""
    qp = random_stage_qp(7)
    # Inflate one stage's Hessian and shrink another's to wreck conditioning.
    Hb = np.asarray(qp.Hb).copy()
    Hb[0] *= 1e3
    Hb[-1] *= 1e-2
    q = np.asarray(qp.q).copy()
    q[:4] *= 1e3
    qp = qp._replace(Hb=jnp.asarray(Hb), q=jnp.asarray(q))
    st_scaled = SET.replace(scaling_iters=10)
    scaled = admm_solve_banded(qp, st_scaled)
    assert bool(scaled.converged)
    P, A = dense_equivalent(qp)
    dense = admm_solve(
        jnp.asarray(P), qp.q, jnp.asarray(A), qp.l, qp.u, st_scaled
    )
    np.testing.assert_allclose(
        np.asarray(scaled.x), np.asarray(dense.x), atol=5e-3
    )


@pytest.mark.parametrize("seed", [0, 1])
def test_banded_cyclic_reduction_matches_thomas(seed):
    """banded_solver='cr' (log-depth) is the same algorithm, same answers."""
    qp = random_stage_qp(seed)
    thomas = admm_solve_banded(qp, SET)
    cr = admm_solve_banded(qp, SET.replace(banded_solver="cr"))
    assert bool(cr.converged)
    assert int(cr.iters) == int(thomas.iters)
    np.testing.assert_allclose(
        np.asarray(cr.x), np.asarray(thomas.x), atol=1e-4
    )


def test_banded_sqp_end_to_end_cartpole():
    """Full SQP with the banded inner solver matches the dense path."""
    from optimal_control_problem_tpu.models import cartpole

    H = 8
    base = dict(
        horizon=H, dt=0.04, alpha=0.3, step_num=6, formulation="reduced"
    )
    dense_cfg = cartpole.make_config(
        **base,
        ADMM_settings={"method": "condensed", "max_iter": 1000, "scaling_iters": 0},
    )
    banded_cfg = cartpole.make_config(
        **base, ADMM_settings={"method": "banded", "max_iter": 1000}
    )
    # scaling_iters isn't parsed from YAML; patch the settings directly.
    dense = cartpole.build(dense_cfg, stagewise=True)
    banded = cartpole.build(banded_cfg, stagewise=True)

    frame = cartpole.initial_state(th=0.4)
    ref = np.array([np.pi])
    for _ in range(2):
        dense.compute_optimal_trajectory(frame, ref)
        banded.compute_optimal_trajectory(frame, ref)
    td = np.asarray(dense.get_optimal_trajectory())
    tb = np.asarray(banded.get_optimal_trajectory())
    assert np.isfinite(tb).all()
    # Dense path uses Ruiz scaling, banded does not: same fixed point to
    # QP-tolerance accuracy.
    np.testing.assert_allclose(tb, td, atol=5e-2)


def test_banded_requires_structure():
    from optimal_control_problem_tpu.models import cartpole

    cfg = cartpole.make_config(
        horizon=6, dt=0.04, formulation="reduced",
        ADMM_settings={"method": "banded"},
    )
    with pytest.raises(ValueError, match="banded"):
        cartpole.build(cfg)  # no stage structure registered


def test_banded_infeasible_qp_certificate():
    """Two contradictory stage-constraint equality rows (x_k[0] == 1 AND
    x_k[0] == 3): the structural certificate tests must flag primal
    infeasibility and stop early."""
    qp = random_stage_qp(0, N=4, w=2, r=0, r2=2)
    Jc = np.zeros((4, 2, 2), np.float32)
    Jc[:, 0, 0] = 1.0  # row A: x_k[0] == 1
    Jc[:, 1, 0] = 1.0  # row B: x_k[0] == 3  (contradiction)
    n = 4 * 2
    l = np.concatenate([np.full(n, -10.0), np.tile([1.0, 3.0], 4)]).astype(
        np.float32
    )
    u = np.concatenate([np.full(n, 10.0), np.tile([1.0, 3.0], 4)]).astype(
        np.float32
    )
    qp = qp._replace(Jc=jnp.asarray(Jc), l=jnp.asarray(l), u=jnp.asarray(u))
    sol = admm_solve_banded(qp, SET.replace(max_iter=2000))
    assert not bool(sol.converged)
    assert bool(sol.prim_inf)
    assert not bool(sol.dual_inf)
    assert int(sol.iters) < 2000


@pytest.mark.parametrize("seed", [0, 1])
def test_banded_polish_improves_accuracy(seed):
    """Active-set polish lifts the banded solution from the 1e-3 ADMM
    tolerance toward f32 precision, matching the dense polished solve."""
    qp = random_stage_qp(seed)
    loose = ADMMSettings(
        eps_abs=1e-3, eps_rel=1e-3, method="condensed",
        scaling_iters=10, adaptive_rho=True,
    )
    plain = admm_solve_banded(qp, loose)
    polished = admm_solve_banded(qp, loose.replace(polish=True))
    assert bool(polished.converged)
    # Tight ground truth from the dense solver.
    P, A = dense_equivalent(qp)
    truth = admm_solve(
        jnp.asarray(P), qp.q, jnp.asarray(A), qp.l, qp.u,
        loose.replace(eps_abs=1e-6, eps_rel=1e-6, polish=True),
    )
    err_plain = float(np.max(np.abs(np.asarray(plain.x) - np.asarray(truth.x))))
    err_pol = float(np.max(np.abs(np.asarray(polished.x) - np.asarray(truth.x))))
    assert err_pol <= err_plain
    assert err_pol < 5e-4
