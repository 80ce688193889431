"""Batch-native banded ADMM (fused Pallas chunk) vs the vmapped reference.

The batch driver must reproduce ``jax.vmap(admm_solve_banded)`` semantics
(thomas solver): same convergence decisions at the same check blocks, same
solutions, same certificates.  On CPU the kernel runs in interpret mode —
the "fake backend" mechanism the reference lacks (SURVEY.md section 4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optimal_control_problem_tpu.solvers.admm import ADMMSettings
from optimal_control_problem_tpu.solvers.admm_banded import (
    BandedQP,
    admm_solve_banded,
)
from optimal_control_problem_tpu.solvers.admm_banded_batch import (
    admm_solve_banded_batch,
    pick_batch_tile,
)
from tests.test_admm_banded import random_stage_qp

SET = ADMMSettings(
    eps_abs=1e-4,
    eps_rel=1e-4,
    method="banded",
    scaling_iters=10,
    adaptive_rho=True,
)


def stack_qps(qps):
    return jax.tree_util.tree_map(lambda *a: jnp.stack(a), *qps)


def vmapped_ref(qp_b, settings, x0=None, y0=None):
    if x0 is None:
        return jax.vmap(lambda q: admm_solve_banded(q, settings))(qp_b)
    return jax.vmap(
        lambda q, x, y: admm_solve_banded(q, settings, x0=x, y0=y)
    )(qp_b, x0, y0)


@pytest.mark.parametrize("adaptive", [True, False])
def test_matches_vmapped_reference(adaptive):
    st = SET.replace(adaptive_rho=adaptive)
    qp_b = stack_qps([random_stage_qp(s) for s in range(6)])
    ref = vmapped_ref(qp_b, st)
    bat = admm_solve_banded_batch(qp_b, st)
    np.testing.assert_array_equal(np.asarray(ref.iters), np.asarray(bat.iters))
    np.testing.assert_array_equal(
        np.asarray(ref.converged), np.asarray(bat.converged)
    )
    np.testing.assert_allclose(
        np.asarray(ref.x), np.asarray(bat.x), atol=5e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(ref.y), np.asarray(bat.y), atol=5e-4, rtol=1e-3
    )


def test_warm_start_and_tiling():
    qp_b = stack_qps([random_stage_qp(s + 10) for s in range(5)])
    n = qp_b.q.shape[1]
    m = qp_b.l.shape[1]
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(5, n)) * 0.1, jnp.float32)
    y0 = jnp.asarray(rng.normal(size=(5, m)) * 0.1, jnp.float32)
    ref = vmapped_ref(qp_b, SET, x0, y0)
    # batch_tile=2 forces batch padding (5 -> 6) and a 3-program grid.
    bat = admm_solve_banded_batch(qp_b, SET, x0=x0, y0=y0, batch_tile=2)
    np.testing.assert_array_equal(np.asarray(ref.iters), np.asarray(bat.iters))
    np.testing.assert_allclose(
        np.asarray(ref.x), np.asarray(bat.x), atol=5e-5, rtol=1e-4
    )


def test_no_stage_constraints_section():
    # r2 = 0 exercises the loose-row padding path.
    qp_b = stack_qps([random_stage_qp(s, r2=0) for s in range(3)])
    ref = vmapped_ref(qp_b, SET)
    bat = admm_solve_banded_batch(qp_b, SET)
    assert bat.y.shape == ref.y.shape
    np.testing.assert_array_equal(np.asarray(ref.iters), np.asarray(bat.iters))
    np.testing.assert_allclose(
        np.asarray(ref.x), np.asarray(bat.x), atol=5e-5, rtol=1e-4
    )


def test_polish_improves_residuals():
    st = SET.replace(polish=True)
    qp_b = stack_qps([random_stage_qp(s + 20) for s in range(3)])
    plain = admm_solve_banded_batch(qp_b, SET)
    pol = admm_solve_banded_batch(qp_b, st)
    assert np.all(np.asarray(pol.r_prim) <= np.asarray(plain.r_prim) + 1e-7)
    assert np.all(np.asarray(pol.r_dual) <= np.asarray(plain.r_dual) + 1e-7)


def test_primal_infeasible_certificate():
    # Contradictory equality rows: x0 pinned to 1 and to 2 via two identical
    # dynamics rows with different bounds -> primal infeasible.
    qp = random_stage_qp(3)
    N, w = qp.Hb.shape[0], qp.Hb.shape[1]
    r = qp.J0.shape[1]
    J0 = np.zeros((N - 1, r, w), np.float32)
    J1 = np.zeros((N - 1, r, w), np.float32)
    J0[0, 0, 0] = 1.0
    J0[0, 1, 0] = 1.0
    l = np.asarray(qp.l).copy()
    u = np.asarray(qp.u).copy()
    n = N * w
    l[n] = u[n] = 1.0
    l[n + 1] = u[n + 1] = 2.0
    bad = qp._replace(
        J0=jnp.asarray(J0), J1=jnp.asarray(J1),
        l=jnp.asarray(l), u=jnp.asarray(u),
    )
    qp_b = stack_qps([bad, random_stage_qp(4)])
    st = SET.replace(max_iter=2000)
    bat = admm_solve_banded_batch(qp_b, st)
    assert bool(bat.prim_inf[0])
    assert not bool(bat.converged[0])
    assert bool(bat.converged[1])
    assert not bool(bat.prim_inf[1])


def test_max_iter_freeze():
    st = SET.replace(eps_abs=1e-12, eps_rel=1e-12, max_iter=100,
                     check_infeasibility=False)
    qp_b = stack_qps([random_stage_qp(s) for s in range(2)])
    bat = admm_solve_banded_batch(qp_b, st)
    assert np.all(np.asarray(bat.iters) == 100)
    assert not np.any(np.asarray(bat.converged))


def test_pick_batch_tile_policy():
    # quadrotor-h100 at B=64 does not fit VMEM at any lane-aligned tile:
    # the driver must fall back to the vmapped XLA loop.
    assert pick_batch_tile(64, 100, 16, 12, 4) is None
    assert pick_batch_tile(256, 21, 5, 4, 1) in (128, 256)
    assert pick_batch_tile(64, 21, 5, 4, 1) == 64  # whole batch, one program


def test_fallback_path_matches():
    # Kernel path (batch_tile auto) must match the vmapped reference even on
    # problems whose solves span multiple rho chunks (s+40 seeds adapt rho).
    qp_b = stack_qps([random_stage_qp(s + 40) for s in range(2)])
    ref = vmapped_ref(qp_b, SET)
    bat = admm_solve_banded_batch(qp_b, SET)
    np.testing.assert_array_equal(np.asarray(ref.iters), np.asarray(bat.iters))


def test_forced_vmap_fallback_matches():
    # batch_tile=-1 forces the VMEM-overflow fallback branch (the vmapped
    # XLA loop); it must agree with the vmapped reference exactly.
    qp_b = stack_qps([random_stage_qp(s + 40) for s in range(2)])
    ref = vmapped_ref(qp_b, SET)
    bat = admm_solve_banded_batch(qp_b, SET, batch_tile=-1)
    np.testing.assert_array_equal(np.asarray(ref.iters), np.asarray(bat.iters))
    np.testing.assert_allclose(
        np.asarray(ref.x), np.asarray(bat.x), atol=5e-5, rtol=1e-4
    )
