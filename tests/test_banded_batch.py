"""Batch-native banded ADMM (fused Pallas chunk) vs the vmapped reference.

The batch driver must reproduce ``jax.vmap(admm_solve_banded)`` semantics
(thomas solver): same chunk boundaries and rho-adaptation points, same
iterates to f32 roundoff, same solutions at the solver tolerance, same
certificates.  Since the M-assembly + factorization moved INTO the chunk
kernel (round 3) the factors agree with the XLA reference only to fp
noise — the op ORDER is aligned (sequential add chains, see
ops/banded_kernel.py), but cross-program fusion/FMA formation differs —
so trajectory agreement is asserted over forced iteration budgets rather
than via exact convergence-iteration equality on knife-edge problems.
On CPU the kernel runs in interpret mode — the "fake backend" mechanism
the reference lacks (SURVEY.md section 4).
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
def test_matches_vmapped_reference_forced_budget(adaptive):
    """Trajectory agreement over a forced iteration budget.

    eps = 0 makes the termination check unsatisfiable, so BOTH paths run
    exactly max_iter iterations (same chunk boundaries, same rho-adaptation
    points) and the iterates can be compared directly.  Since the
    factorization moved INTO the chunk kernel, the factors agree with the
    XLA reference only to f32 roundoff (cross-program fusion/FMA differs;
    the op ORDER is aligned — see ops/banded_kernel.py `outer_r`), so
    exact-iteration-count equality on knife-edge problems no longer holds
    and the contract is: same trajectory to fp noise, same solutions at
    the solver tolerance (next test).
    """
    st = SET.replace(
        adaptive_rho=adaptive, eps_abs=0.0, eps_rel=0.0, max_iter=100,
        check_infeasibility=False,
    )
    qp_b = stack_qps([random_stage_qp(s) for s in range(6)])
    ref = vmapped_ref(qp_b, st)
    bat = admm_solve_banded_batch(qp_b, st)
    np.testing.assert_array_equal(np.asarray(ref.iters), np.asarray(bat.iters))
    np.testing.assert_allclose(
        np.asarray(ref.x), np.asarray(bat.x), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(ref.y), np.asarray(bat.y), atol=1e-3, rtol=1e-2
    )


@pytest.mark.parametrize("adaptive", [True, False])
def test_matches_vmapped_reference_solutions(adaptive):
    """Production contract: both paths converge and return solutions that
    agree at the solver tolerance (iteration counts may differ by a check
    block on knife-edge problems — see the forced-budget test above)."""
    st = SET.replace(adaptive_rho=adaptive)
    qp_b = stack_qps([random_stage_qp(s) for s in range(6)])
    ref = vmapped_ref(qp_b, st)
    bat = admm_solve_banded_batch(qp_b, st)
    # The batch path must converge wherever the reference does (allow the
    # reference to be the stricter one on stalls: adaptive=False QPs can
    # sit at the f32 dual-residual floor within an ulp of the tolerance).
    if adaptive:
        assert bool(np.all(np.asarray(ref.converged)))
        assert bool(np.all(np.asarray(bat.converged)))
    np.testing.assert_allclose(
        np.asarray(ref.x), np.asarray(bat.x), atol=5e-3, rtol=1e-2
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


def test_multi_chunk_matches():
    # Kernel path (batch_tile auto) on problems whose solves span multiple
    # rho chunks (s+40 seeds adapt rho): forced budget across 2 chunks so
    # the trajectories (including the in-kernel refactorization after the
    # driver's rho update) can be compared directly.
    st = SET.replace(
        eps_abs=0.0, eps_rel=0.0, max_iter=200, check_infeasibility=False
    )
    qp_b = stack_qps([random_stage_qp(s + 40) for s in range(2)])
    ref = vmapped_ref(qp_b, st)
    bat = admm_solve_banded_batch(qp_b, st)
    np.testing.assert_array_equal(np.asarray(ref.iters), np.asarray(bat.iters))
    np.testing.assert_allclose(
        np.asarray(ref.x), np.asarray(bat.x), atol=2e-4, rtol=1e-3
    )


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


# ---------------------------------------------------------------------------
# Rolled-kernel variant (ops/banded_rolled_kernel.py): the loop-structured
# twin used for long horizons (quadrotor h100) where the unrolled kernel's
# register spills blow past VMEM.  Must match the vmapped reference with
# the same contracts as the unrolled kernel.


@pytest.mark.parametrize("adaptive", [True, False])
def test_rolled_matches_vmapped_reference_forced_budget(adaptive):
    st = SET.replace(
        adaptive_rho=adaptive, eps_abs=0.0, eps_rel=0.0, max_iter=100,
        check_infeasibility=False,
    )
    qp_b = stack_qps([random_stage_qp(s) for s in range(4)])
    ref = vmapped_ref(qp_b, st)
    bat = admm_solve_banded_batch(qp_b, st, rolled=True)
    np.testing.assert_array_equal(np.asarray(ref.iters), np.asarray(bat.iters))
    np.testing.assert_allclose(
        np.asarray(ref.x), np.asarray(bat.x), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(ref.y), np.asarray(bat.y), atol=1e-3, rtol=1e-2
    )


def test_rolled_matches_unrolled_kernel():
    """The two kernel variants run the same chunk boundaries, but the
    rolled kernel's TWO-WAY (twisted) factorization eliminates stages in
    a different order, so the factors agree only to fp roundoff —
    trajectory agreement is asserted over a forced iteration budget (the
    same policy as the kernel-vs-XLA tests above; knife-edge scenarios
    can converge a whole check block apart at the residual floor), plus
    solution agreement at the solver tolerance."""
    st = SET.replace(
        eps_abs=0.0, eps_rel=0.0, max_iter=100, check_infeasibility=False
    )
    qp_b = stack_qps([random_stage_qp(s + 7) for s in range(4)])
    a = admm_solve_banded_batch(qp_b, st)
    b = admm_solve_banded_batch(qp_b, st, rolled=True)
    np.testing.assert_array_equal(np.asarray(a.iters), np.asarray(b.iters))
    np.testing.assert_allclose(
        np.asarray(a.x), np.asarray(b.x), atol=2e-4, rtol=1e-3
    )
    a2 = admm_solve_banded_batch(qp_b, SET)
    b2 = admm_solve_banded_batch(qp_b, SET, rolled=True)
    np.testing.assert_allclose(
        np.asarray(a2.x), np.asarray(b2.x), atol=5e-3, rtol=1e-2
    )


def test_rolled_warm_start_and_certificates():
    qp_b = stack_qps([random_stage_qp(s + 10) for s in range(3)])
    n = qp_b.q.shape[1]
    m = qp_b.l.shape[1]
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(3, n)) * 0.1, jnp.float32)
    y0 = jnp.asarray(rng.normal(size=(3, m)) * 0.1, jnp.float32)
    ref = vmapped_ref(qp_b, SET, x0, y0)
    bat = admm_solve_banded_batch(qp_b, SET, x0=x0, y0=y0, rolled=True)
    np.testing.assert_array_equal(np.asarray(ref.iters), np.asarray(bat.iters))
    np.testing.assert_allclose(
        np.asarray(ref.x), np.asarray(bat.x), atol=5e-5, rtol=1e-4
    )


def test_rolled_tile_policy():
    from optimal_control_problem_tpu.ops.banded_rolled_kernel import (
        pick_rolled_tile,
    )

    # quadrotor h100 (the unrolled kernel's VMEM failure case, r2 padded
    # to 1) MUST fit the rolled kernel at lane width.
    assert pick_batch_tile(64, 100, 16, 12, 1) is None
    assert pick_rolled_tile(64, 100, 16, 12, 1) == 64
    # ... but a horizon so long that even the data cannot fit must still
    # hand back None (XLA fallback).
    assert pick_rolled_tile(64, 600, 16, 12, 1) is None


def test_precomputed_scalings_match_full_ruiz():
    """scalings=... (the scaling_refresh="tick" reuse path) with factors
    computed by ruiz_scalings_batch on the SAME qp must reproduce the
    in-driver Ruiz path exactly."""
    from optimal_control_problem_tpu.solvers.admm_banded_batch import (
        ruiz_scalings_batch,
    )

    qp_b = stack_qps([random_stage_qp(s) for s in range(3)])
    ref = admm_solve_banded_batch(qp_b, SET)
    sc = ruiz_scalings_batch(qp_b, SET.scaling_iters)
    pre = admm_solve_banded_batch(qp_b, SET, scalings=sc)
    np.testing.assert_array_equal(np.asarray(ref.iters), np.asarray(pre.iters))
    np.testing.assert_allclose(
        np.asarray(ref.x), np.asarray(pre.x), atol=1e-6, rtol=1e-5
    )


def test_scaling_refresh_tick_sqp_converges():
    """End-to-end banded batch SQP with scaling_refresh="tick": stale
    preconditioner, same solutions at the MPC tolerance."""
    from optimal_control_problem_tpu.models import cartpole
    from optimal_control_problem_tpu.parallel import BatchedSolver

    B, H = 4, 8
    rng = np.random.default_rng(0)
    frames = np.zeros((B, cartpole.FRAME), np.float32)
    frames[:, 2] = rng.uniform(-0.5, 0.5, B).astype(np.float32)
    refs = np.full((B, 1), np.pi, np.float32)

    def run(refresh):
        cfg = cartpole.make_config(
            horizon=H, dt=0.04, alpha=0.3, step_num=6,
            formulation="reduced",
            ADMM_settings={
                "method": "banded", "max_iter": 500,
                "adaptive_rho": False, "rho": 0.05,
                "scaling_refresh": refresh,
            },
        )
        b = BatchedSolver(cartpole.build(cfg, stagewise=True))
        st = b.init_state(B)
        for _ in range(3):
            t, o, st = b.solve(frames, refs, st)
        return np.asarray(t), np.asarray(o)

    t_step, o_step = run("step")
    t_tick, o_tick = run("tick")
    assert np.isfinite(t_tick).all()
    np.testing.assert_allclose(o_tick, o_step, rtol=1e-2)
    np.testing.assert_allclose(t_tick, t_step, atol=5e-3)


def test_precomputed_scalings_with_padded_sections():
    """scalings path on a qp with r2=0 (driver pads an inert sc section):
    unit scalings must be inserted for the padded rows."""
    from optimal_control_problem_tpu.solvers.admm_banded_batch import (
        ruiz_scalings_batch,
    )

    qp_b = stack_qps([random_stage_qp(s, r2=0) for s in range(3)])
    ref = admm_solve_banded_batch(qp_b, SET)
    sc = ruiz_scalings_batch(qp_b, SET.scaling_iters)
    pre = admm_solve_banded_batch(qp_b, SET, scalings=sc)
    np.testing.assert_array_equal(np.asarray(ref.iters), np.asarray(pre.iters))
    np.testing.assert_allclose(
        np.asarray(ref.x), np.asarray(pre.x), atol=1e-6, rtol=1e-5
    )


# ---------------------------------------------------------------------------
# Cyclic-reduction chunk kernel (ops/banded_cr_kernel.py): log-depth solves
# selected by banded_solver="cr" on the batch path.


@pytest.mark.parametrize("adaptive", [True, False])
def test_cr_kernel_matches_vmapped_reference_forced_budget(adaptive):
    """CR kernel vs the vmapped XLA cr path over a forced budget: same
    chunk/adaptation schedule, trajectories to fp noise."""
    st = SET.replace(
        adaptive_rho=adaptive, eps_abs=0.0, eps_rel=0.0, max_iter=100,
        check_infeasibility=False, banded_solver="cr",
    )
    qp_b = stack_qps([random_stage_qp(s) for s in range(4)])
    ref = vmapped_ref(qp_b, st)
    bat = admm_solve_banded_batch(qp_b, st)
    np.testing.assert_array_equal(np.asarray(ref.iters), np.asarray(bat.iters))
    np.testing.assert_allclose(
        np.asarray(ref.x), np.asarray(bat.x), atol=5e-4, rtol=1e-3
    )


def test_cr_kernel_matches_thomas_solutions():
    """Converged solutions agree across the CR and Thomas kernel variants
    at the solver tolerance (different algorithms, same fixed point)."""
    st_cr = SET.replace(banded_solver="cr")
    qp_b = stack_qps([random_stage_qp(s + 3) for s in range(4)])
    a = admm_solve_banded_batch(qp_b, SET)
    b = admm_solve_banded_batch(qp_b, st_cr)
    assert bool(np.all(np.asarray(b.converged)))
    np.testing.assert_allclose(
        np.asarray(a.x), np.asarray(b.x), atol=5e-3, rtol=1e-2
    )


def test_cr_kernel_warm_start_and_no_sc_section():
    st_cr = SET.replace(banded_solver="cr")
    qp_b = stack_qps([random_stage_qp(s + 10, r2=0) for s in range(3)])
    n = qp_b.q.shape[1]
    m = qp_b.l.shape[1]
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(3, n)) * 0.1, jnp.float32)
    y0 = jnp.asarray(rng.normal(size=(3, m)) * 0.1, jnp.float32)
    ref = vmapped_ref(qp_b, st_cr, x0, y0)
    bat = admm_solve_banded_batch(qp_b, st_cr, x0=x0, y0=y0)
    np.testing.assert_array_equal(np.asarray(ref.iters), np.asarray(bat.iters))
    np.testing.assert_allclose(
        np.asarray(ref.x), np.asarray(bat.x), atol=5e-4, rtol=1e-3
    )


def test_cr_kernel_odd_horizon_padding():
    """N=7 exercises the per-level odd padding (7 -> 8 -> 4 -> 2 -> 1)."""
    st_cr = SET.replace(banded_solver="cr")
    qp_b = stack_qps([random_stage_qp(s, N=7) for s in range(3)])
    ref = vmapped_ref(qp_b, st_cr)
    bat = admm_solve_banded_batch(qp_b, st_cr)
    np.testing.assert_array_equal(np.asarray(ref.iters), np.asarray(bat.iters))
    np.testing.assert_allclose(
        np.asarray(ref.x), np.asarray(bat.x), atol=5e-4, rtol=1e-3
    )


def test_rolled_depth1_cr_level_matches_reference():
    """Even horizons >= 16 trigger the rolled kernel's depth-1
    cyclic-reduction level (odd stages eliminated in one stage-parallel
    pass; two-way sweeps on the half-size reduced system).  The
    elimination is exact, so over a forced budget the trajectory must
    match the vmapped XLA reference to fp roundoff, and production
    solves must agree at the solver tolerance.  (Iteration-count
    equality is not asserted: a different elimination order shifts
    knife-edge convergence blocks — same policy as the two-way tests.)"""
    st = SET.replace(
        eps_abs=0.0, eps_rel=0.0, max_iter=60, check_infeasibility=False,
        adaptive_rho=False,
    )
    qp_b = stack_qps([random_stage_qp(s, N=16, w=4) for s in range(3)])
    ref = vmapped_ref(qp_b, st)
    bat = admm_solve_banded_batch(qp_b, st, rolled=True)
    np.testing.assert_allclose(
        np.asarray(ref.x), np.asarray(bat.x), atol=3e-4, rtol=1e-3
    )
    st2 = SET.replace(adaptive_rho=False)
    ref2 = vmapped_ref(qp_b, st2)
    bat2 = admm_solve_banded_batch(qp_b, st2, rolled=True)
    np.testing.assert_allclose(
        np.asarray(ref2.x), np.asarray(bat2.x), atol=5e-3, rtol=1e-2
    )
    # Odd horizon stays on the plain two-way path (no level machinery).
    qp_o = stack_qps([random_stage_qp(s + 3, N=17, w=4) for s in range(2)])
    ref3 = vmapped_ref(qp_o, st)
    bat3 = admm_solve_banded_batch(qp_o, st, rolled=True)
    np.testing.assert_allclose(
        np.asarray(ref3.x), np.asarray(bat3.x), atol=3e-4, rtol=1e-3
    )
