"""Tests for the shared-system (LTI) batched fast path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optimal_control_problem_tpu.solvers.admm import ADMMSettings, admm_solve
from optimal_control_problem_tpu.solvers.admm_batched import admm_solve_shared
from optimal_control_problem_tpu.models import cartpole
from optimal_control_problem_tpu.models import double_integrator as di
from optimal_control_problem_tpu.parallel import BatchedSolver

SET = ADMMSettings(eps_abs=1e-4, eps_rel=1e-4, method="condensed", adaptive_rho=False)


def test_admm_shared_matches_per_problem():
    rng = np.random.default_rng(0)
    B, n, m = 8, 6, 9
    L = rng.normal(size=(n, n))
    P = (L @ L.T + 0.5 * np.eye(n)).astype(np.float32)
    A = rng.normal(size=(m, n)).astype(np.float32)
    qs = rng.normal(size=(B, n)).astype(np.float32)
    x_feas = rng.normal(size=(B, n))
    centers = x_feas @ A.T
    ls = (centers - rng.uniform(0.2, 1.5, size=(B, m))).astype(np.float32)
    us = (centers + rng.uniform(0.2, 1.5, size=(B, m))).astype(np.float32)

    batch = admm_solve_shared(
        jnp.asarray(P), jnp.asarray(A), jnp.asarray(qs), jnp.asarray(ls),
        jnp.asarray(us), SET,
    )
    assert bool(jnp.all(batch.converged))
    for b in range(B):
        single = admm_solve(
            jnp.asarray(P), jnp.asarray(qs[b]), jnp.asarray(A),
            jnp.asarray(ls[b]), jnp.asarray(us[b]), SET,
        )
        np.testing.assert_allclose(
            batch.x[b], single.x, atol=5e-3,
            err_msg=f"scenario {b} diverges from per-problem solve",
        )


def test_shared_with_inf_and_equality_rows():
    # Structural row types: equality rows + loose rows, like a pinned-frame
    # MPC QP.
    rng = np.random.default_rng(1)
    B, n = 4, 5
    P = np.diag(rng.uniform(0.5, 2.0, n)).astype(np.float32)
    A = np.vstack([np.eye(n), rng.normal(size=(2, n))]).astype(np.float32)
    m = n + 2
    qs = rng.normal(size=(B, n)).astype(np.float32)
    ls = np.tile(
        np.concatenate([np.full(2, 0.3), np.full(n - 2, -np.inf), np.full(2, -np.inf)]),
        (B, 1),
    ).astype(np.float32)
    us = np.tile(
        np.concatenate([np.full(2, 0.3), np.full(n - 2, np.inf), np.full(2, np.inf)]),
        (B, 1),
    ).astype(np.float32)
    batch = admm_solve_shared(
        jnp.asarray(P), jnp.asarray(A), jnp.asarray(qs), jnp.asarray(ls),
        jnp.asarray(us), SET,
    )
    assert bool(jnp.all(batch.converged))
    # First two variables pinned to 0.3 by the equality rows.
    np.testing.assert_allclose(batch.x[:, :2], 0.3, atol=2e-3)


def test_lti_detection():
    ocp = di.build(di.make_config(horizon=6, dt=0.05))
    assert ocp.solver.shared_system, "double integrator must detect as LTI"
    assert ocp.solver.solve_batch_fn is not None

    cp = cartpole.build(cartpole.make_config(horizon=4, dt=0.02))
    assert not cp.solver.shared_system, "cartpole must detect as nonlinear"
    assert cp.solver.solve_batch_fn is None


def test_batched_shared_path_matches_generic():
    # Tight, deterministic QP settings: comparing intermediate damped-SQP
    # iterates is only well-posed when both paths solve each QP accurately
    # with the same (non-adaptive) algorithm trajectory.
    tight = {
        "eps_abs": 1e-4,
        "eps_rel": 1e-4,
        "adaptive_rho": False,
        "method": "condensed",
    }
    H = 6
    cfg = di.make_config(
        horizon=H, dt=0.05, alpha=0.7, step_num=5, ADMM_settings=tight
    )
    ocp_fast = di.build(cfg)
    assert ocp_fast.solver.shared_system

    cfg_slow = di.make_config(
        horizon=H,
        dt=0.05,
        alpha=0.7,
        step_num=5,
        shared_system=False,
        ADMM_settings=tight,
    )
    ocp_slow = di.build(cfg_slow)
    assert not ocp_slow.solver.shared_system

    B = 5
    rng = np.random.default_rng(3)
    frames = np.zeros((B, di.FRAME), np.float32)
    frames[:, 0:2] = rng.uniform(-1, 1, size=(B, 2))
    refs = np.zeros((B, H * 2), np.float32)

    fast = BatchedSolver(ocp_fast)
    slow = BatchedSolver(ocp_slow)
    sf, ss = fast.init_state(B), slow.init_state(B)
    for _ in range(4):  # iterate to the MPC fixed point before comparing
        tf, ff, sf = fast.solve(frames, refs, sf)
        ts, fs_, ss = slow.solve(frames, refs, ss)
    # Both paths solve to the same OSQP tolerance; weakly-penalized
    # coordinates (final-frame accelerations, w=1e-3) are only determined
    # to ~tolerance/weight, so compare objectives and the well-conditioned
    # position/velocity trajectory.
    np.testing.assert_allclose(np.asarray(ff), np.asarray(fs_), rtol=2e-2)
    tf_fr = np.asarray(tf).reshape(B, H, di.FRAME)
    ts_fr = np.asarray(ts).reshape(B, H, di.FRAME)
    np.testing.assert_allclose(tf_fr[..., 0:4], ts_fr[..., 0:4], atol=2e-2)
