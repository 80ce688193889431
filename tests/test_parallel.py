"""Batched (vmap) and multi-chip (mesh/shard_map) scenario-MPC tests.

Runs on the 8-device virtual CPU mesh from conftest — the fake-backend
mechanism the reference lacks (SURVEY.md section 4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optimal_control_problem_tpu.models import double_integrator as di
from optimal_control_problem_tpu.parallel import (
    BatchedSolver,
    DistributedSolver,
    consensus_mean,
    make_mesh,
)


@pytest.fixture(scope="module")
def ocp():
    # Tight deterministic QP settings so cross-path comparisons are
    # well-posed (see test_shared_system.py).
    cfg = di.make_config(
        horizon=8,
        dt=0.05,
        alpha=0.7,
        step_num=6,
        ADMM_settings={
            "eps_abs": 1e-4,
            "eps_rel": 1e-4,
            "adaptive_rho": False,
            "method": "condensed",
        },
    )
    return di.build(cfg)


def _scenarios(B, H):
    rng = np.random.default_rng(7)
    frames = np.zeros((B, di.FRAME))
    frames[:, 0:2] = rng.uniform(-1, 1, size=(B, 2))
    refs = np.tile(np.zeros(2), (B, H)).reshape(B, H * 2)
    return frames, refs


def test_batched_solver_matches_single(ocp):
    B, H = 4, 8
    TICKS = 4  # iterate to the MPC fixed point before comparing
    frames, refs = _scenarios(B, H)
    batched = BatchedSolver(ocp)
    state = batched.init_state(B)
    for _ in range(TICKS):
        trajs, objs, state = batched.solve(frames, refs, state)
    assert trajs.shape == (B, ocp.ocp_config.num_variables)

    # Scenario 0 must match an identical sequence of single solves.  (The
    # paths differ in per-scenario vs shared cost scaling, so transient
    # iterates agree only loosely; the converged fixed point agrees.)
    solver = ocp.solver
    solver.reset()
    lbx = ocp.ocp_config.lower_bounds_flat().copy()
    ubx = ocp.ocp_config.upper_bounds_flat().copy()
    lbx[: di.FRAME] = frames[0]
    ubx[: di.FRAME] = frames[0]
    for _ in range(TICKS):
        res = solver.get_optimal_solution(
            {
                "lbx": lbx,
                "ubx": ubx,
                "lbg": ocp.get_constraint_lower_bounds(),
                "ubg": ocp.get_constraint_upper_bounds(),
                "p": refs[0],
            }
        )
    b_fr = np.asarray(trajs[0]).reshape(H, di.FRAME)
    s_fr = np.asarray(res["x"]).reshape(H, di.FRAME)
    np.testing.assert_allclose(b_fr[:, 0:4], s_fr[:, 0:4], atol=2e-2)


def test_batched_warm_start_persists(ocp):
    B, H = 3, 8
    frames, refs = _scenarios(B, H)
    batched = BatchedSolver(ocp)
    state = batched.init_state(B)
    t1, _, state = batched.solve(frames, refs, state)
    t2, _, state = batched.solve(frames, refs, state)
    # Warm-started second tick continues converging: trajectories change
    # (still converging) but first frames stay pinned.
    fs = di.FRAME
    np.testing.assert_allclose(
        np.asarray(t2)[:, :fs], frames, atol=5e-3
    )


def test_distributed_solver_8_devices(ocp):
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    B, H = 16, 8
    frames, refs = _scenarios(B, H)
    batched = BatchedSolver(ocp)
    dist = DistributedSolver(batched)
    assert dist.n_devices == 8
    state = dist.init_state(B)
    trajs, objs, state = dist.solve(frames, refs, state)
    assert trajs.shape == (B, ocp.ocp_config.num_variables)

    # Results must be identical to the unsharded batched solve.
    bstate = batched.init_state(B)
    ref_trajs, _, _ = batched.solve(frames, refs, bstate)
    np.testing.assert_allclose(
        np.asarray(trajs), np.asarray(ref_trajs), atol=1e-5
    )


def test_distributed_batch_divisibility(ocp):
    batched = BatchedSolver(ocp)
    dist = DistributedSolver(batched)
    with pytest.raises(ValueError, match="not divisible"):
        dist.init_state(10)


def test_consensus_mean_collective():
    mesh = make_mesh(("batch",))
    B, d = 16, 2
    vals = np.arange(B * d, dtype=np.float32).reshape(B, d)
    out = consensus_mean(jnp.asarray(vals), mesh)
    np.testing.assert_allclose(np.asarray(out), vals.mean(axis=0), rtol=1e-6)


def test_consensus_first_control(ocp):
    B, H = 8, 8
    frames, refs = _scenarios(B, H)
    batched = BatchedSolver(ocp)
    dist = DistributedSolver(batched)
    state = dist.init_state(B)
    trajs, _, state = dist.solve(frames, refs, state)
    u = dist.consensus_first_control(trajs, slice(4, 6))
    assert u.shape == (2,)
    manual = np.asarray(trajs)[:, 4:6].mean(axis=0)
    np.testing.assert_allclose(np.asarray(u), manual, atol=1e-5)


def test_batched_banded_routes_and_matches_vmapped():
    """Stage-structured (nonlinear) models route BatchedSolver through the
    batch-native banded Pallas driver (solve_batch_banded_fn), and its
    results bit-match the vmapped per-scenario banded solve — same QP
    iteration counts, same trajectories, and populated per-step QP status."""
    from optimal_control_problem_tpu.models import cartpole

    cfg = cartpole.make_config(horizon=8, dt=0.04, alpha=0.3, step_num=4)
    ocp = cartpole.build(cfg, stagewise=True)
    solver = ocp.solver
    assert solver.solve_batch_banded_fn is not None
    assert solver.solve_batch_fn is None  # nonlinear: no shared-system path

    B = 3
    rng = np.random.default_rng(3)
    frames = np.zeros((B, cartpole.FRAME))
    frames[:, 2] = rng.uniform(-0.4, 0.4, size=B)  # theta spread
    refs = np.full((B, 1), np.pi)

    batched = BatchedSolver(ocp)
    state = batched.init_state(B)
    trajs, objs, state = batched.solve(frames, refs, state)
    res_b = batched.last_result
    assert res_b is not None
    # Per-step QP status populated for every scenario (steps, B).
    assert np.asarray(res_b.qp_converged).shape == (4, B)
    assert np.all(np.asarray(res_b.qp_converged))
    assert not np.any(np.asarray(res_b.qp_prim_inf))

    # vmapped per-scenario reference over the same inputs.
    n_x = ocp.ocp_config.num_variables
    lbx = np.tile(ocp.ocp_config.lower_bounds_flat(), (B, 1))
    ubx = np.tile(ocp.ocp_config.upper_bounds_flat(), (B, 1))
    fs = cartpole.FRAME
    lbx[:, :fs] = frames
    ubx[:, :fs] = frames
    lbg = np.tile(ocp.get_constraint_lower_bounds(), (B, 1))
    ubg = np.tile(ocp.get_constraint_upper_bounds(), (B, 1))
    x0 = np.zeros((B, n_x), np.float32)
    qx0 = np.zeros((B, solver._qp_n), np.float32)
    qy0 = np.zeros((B, solver._qp_m), np.float32)
    ref = jax.vmap(
        lambda x, p, lo, hi, lg, ug, qx, qy: solver.solve_fn(
            x, p, lo, hi, lg, ug, qx, qy
        )
    )(x0, refs.astype(np.float32), lbx.astype(np.float32),
      ubx.astype(np.float32), lbg.astype(np.float32),
      ubg.astype(np.float32), qx0, qy0)

    # vmap stacks per-scenario (steps,) as (B, steps); the batch driver
    # scans over steps giving (steps, B).
    np.testing.assert_array_equal(
        np.asarray(ref.qp_iters).T, np.asarray(res_b.qp_iters)
    )
    np.testing.assert_allclose(
        np.asarray(ref.x), np.asarray(trajs), atol=1e-5, rtol=1e-5
    )
