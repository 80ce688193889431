"""Tests for the OptimalControlProblem user API (C1 parity) and the MPC tick
semantics, using the double-integrator model."""

import numpy as np
import pytest

from optimal_control_problem_tpu import OptimalControlProblem, SolverType
from optimal_control_problem_tpu import sym as S
from optimal_control_problem_tpu.models import double_integrator as di
from optimal_control_problem_tpu.solvers.admm import ADMMSettings


def small_config(solve_method="TPU_SQP", **kw):
    return di.make_config(
        horizon=8, dt=0.05, solve_method=solve_method, alpha=1.0, step_num=6, **kw
    )


def test_config_validation():
    cfg = small_config()
    del cfg["solver_settings"]["max_iter"]
    with pytest.raises(ValueError, match="Invalid configuration"):
        OptimalControlProblem(cfg)


def test_unknown_solver_type():
    cfg = small_config()
    cfg["solver_settings"]["solve_method"] = "MAGIC"
    with pytest.raises(ValueError, match="Unknown solver type"):
        OptimalControlProblem(cfg)


def test_cuda_sqp_alias_maps_to_tpu():
    cfg = small_config(solve_method="CUDA_SQP")
    ocp = di.DoubleIntegratorOCP(cfg)
    assert ocp.get_solver_type() == SolverType.TPU_SQP


def test_gen_solver_requires_constraints():
    cfg = small_config()
    ocp = OptimalControlProblem(cfg)
    ocp.set_reference(4)
    ocp.add_scalar_cost(lambda X, P: (X**2).sum())
    with pytest.raises(RuntimeError, match="Constraints are empty"):
        ocp.gen_solver()


def test_dimension_mismatch_errors():
    ocp = di.build(small_config())
    H = ocp.ocp_config.get_horizon()
    with pytest.raises(ValueError, match="State dimension mismatch"):
        ocp.compute_optimal_trajectory(np.zeros(3), np.zeros(H * 2))
    with pytest.raises(ValueError, match="Reference dimension mismatch"):
        ocp.compute_optimal_trajectory(np.zeros(6), np.zeros(3))


def test_double_integrator_tick_and_warm_start():
    ocp = di.build(small_config())
    cfg = ocp.ocp_config
    H, dt = cfg.get_horizon(), cfg.get_dt()
    frame = di.initial_state(pos=(1.0, 0.0))
    ref = di.reference_circle(H, dt)
    ocp.compute_optimal_trajectory(frame, ref)
    traj1 = ocp.get_optimal_frames()
    # First frame must be pinned to the measured state (cpp:93-96).
    np.testing.assert_allclose(traj1[0], frame, atol=5e-3)
    # Dynamics constraints approximately satisfied.
    pos, vel, acc = traj1[:, 0:2], traj1[:, 2:4], traj1[:, 4:6]
    np.testing.assert_allclose(pos[1:], pos[:-1] + dt * vel[:-1], atol=2e-2)
    np.testing.assert_allclose(vel[1:], vel[:-1] + dt * acc[:-1], atol=2e-2)

    # Second tick warm starts from the previous trajectory and improves.
    ocp.compute_optimal_trajectory(frame, ref)
    traj2 = ocp.get_optimal_frames()
    np.testing.assert_allclose(traj2[0], frame, atol=5e-3)


def test_tracking_converges_toward_reference():
    ocp = di.build(small_config())
    cfg = ocp.ocp_config
    H, dt = cfg.get_horizon(), cfg.get_dt()
    target = np.tile([0.5, -0.25], H)
    frame = di.initial_state(pos=(0.5, -0.25))
    for _ in range(3):
        ocp.compute_optimal_trajectory(frame, target)
    traj = ocp.get_optimal_frames()
    # Already at the target: positions should stay near it.
    np.testing.assert_allclose(traj[:, 0:2], target.reshape(H, 2), atol=5e-2)


def test_ipopt_backend_matches_tpu_sqp():
    """Cross-check: host interior-point backend vs the jitted TPU SQP on an
    identical problem (the fake-backend validation the reference lacks)."""
    frame = di.initial_state(pos=(0.2, -0.1))
    cfg_t = small_config(
        ADMM_settings={"eps_abs": 1e-4, "eps_rel": 1e-4}
    )
    ocp_t = di.build(cfg_t)
    H, dt = 8, 0.05
    ref = np.tile([0.0, 0.0], H)
    for _ in range(4):  # extra ticks let the fixed-iteration SQP converge
        ocp_t.compute_optimal_trajectory(frame, ref)
    xt = np.asarray(ocp_t.get_optimal_trajectory())

    cfg_h = small_config(solve_method="IPOPT")
    ocp_h = di.build(cfg_h)
    ocp_h.compute_optimal_trajectory(frame, ref)
    xh = np.asarray(ocp_h.get_optimal_trajectory())
    np.testing.assert_allclose(xt, xh, atol=5e-3)


def test_mixed_backend_switches():
    ocp = di.build(small_config(solve_method="MIXED"))
    H, dt = 8, 0.05
    frame = di.initial_state()
    ref = np.zeros(H * 2)
    ocp.compute_optimal_trajectory(frame, ref)  # first tick -> IPOPT (host)
    first = np.asarray(ocp.get_optimal_trajectory())
    ocp.compute_optimal_trajectory(frame, ref)  # later ticks -> TPU_SQP
    second = np.asarray(ocp.get_optimal_trajectory())
    assert first.shape == second.shape
    np.testing.assert_allclose(first, second, atol=1e-2)


def test_mixed_reference_dispatch_always_sqp_after_tick1():
    """Default MIXED reproduces the reference's ACTUAL tick-2+ behavior
    (OptimalControlProblem.cpp:92,153-161: `res` is freshly
    default-constructed each call, so the f>1e-6 IPOPT branch never fires):
    every tick after the first runs the SQP engine even when the objective
    stays large."""
    frame = di.initial_state(pos=(5.0, -5.0))  # large tracking error
    ref = np.tile([4.0, 4.0], 8)  # nonzero optimal cost >> 1e-6
    ocp = di.build(small_config(solve_method="MIXED"))
    ocp.compute_optimal_trajectory(frame, ref)  # tick 1: IPOPT
    assert ocp.get_solver_stats() == {}  # host tick -> no TPU stats
    ocp.compute_optimal_trajectory(frame, ref)  # tick 2: must be TPU SQP
    assert ocp.get_solver_stats() != {}  # TPU stats present -> SQP ran


def test_mixed_intent_dispatch_uses_host_on_large_objective():
    """mixed_dispatch='intent' (opt-in) keeps falling back to the host
    interior-point while the previous objective exceeds 1e-6."""
    frame = di.initial_state(pos=(5.0, -5.0))
    ref = np.tile([4.0, 4.0], 8)
    ocp = di.build(
        small_config(solve_method="MIXED", mixed_dispatch="intent")
    )
    ocp.compute_optimal_trajectory(frame, ref)  # tick 1: IPOPT
    ocp.compute_optimal_trajectory(frame, ref)  # f >> 1e-6 -> IPOPT again
    assert ocp.get_solver_stats() == {}  # still no TPU solve


def test_mixed_dispatch_validation():
    with pytest.raises(ValueError, match="mixed_dispatch"):
        di.build(small_config(solve_method="MIXED", mixed_dispatch="bogus"))


def test_sym_api_problem():
    """Build a problem through the CasADi-style Sym API end to end
    (get_variable slices + add_vector_cost + add_equation_constraint)."""
    cfg = small_config()
    ocp = OptimalControlProblem(cfg)
    occfg = ocp.ocp_config
    H, dt = occfg.get_horizon(), occfg.get_dt()
    ocp.set_reference(2)
    P = ocp.get_reference()

    for k in range(H):
        pos = occfg.get_variable(k, "pos")
        acc = occfg.get_variable(k, "acc")
        ocp.add_vector_cost([10.0, 10.0], pos - P)
        ocp.add_vector_cost([1e-3, 1e-3], acc)
    for k in range(H - 1):
        pos, vel, acc = (
            occfg.get_variable(k, n) for n in ("pos", "vel", "acc")
        )
        pos1, vel1 = (occfg.get_variable(k + 1, n) for n in ("pos", "vel"))
        ocp.add_equation_constraint(f"dyn_p{k}", pos1, pos + dt * vel)
        ocp.add_equation_constraint(f"dyn_v{k}", vel1, vel + dt * acc)
    ocp.gen_solver()
    frame = di.initial_state(pos=(0.3, 0.3))
    for _ in range(3):
        ocp.compute_optimal_trajectory(frame, np.array([0.3, 0.3]))
    traj = ocp.get_optimal_frames()
    np.testing.assert_allclose(traj[0, 0:2], [0.3, 0.3], atol=5e-3)
    np.testing.assert_allclose(traj[-1, 0:2], [0.3, 0.3], atol=5e-2)


def test_initial_guess_used_on_first_tick():
    cfg = small_config()
    ocp = di.DoubleIntegratorOCP(cfg)
    ocp.gen_solver()
    ig = np.tile(di.initial_state(pos=(1.0, 1.0)), 8)
    ocp.ocp_config.set_initial_guess(ig)
    frame = di.initial_state(pos=(1.0, 1.0))
    ocp.compute_optimal_trajectory(frame, np.tile([1.0, 1.0], 8))
    assert ocp.get_optimal_trajectory() is not None


def test_constraint_bookkeeping():
    ocp = di.DoubleIntegratorOCP(small_config())
    H = 8
    n_dyn = (H - 1) * 4
    assert ocp.num_constraints == n_dyn
    assert len(ocp.get_constraint_names()) == n_dyn
    assert ocp.get_constraint_lower_bounds().shape == (n_dyn,)
    np.testing.assert_allclose(ocp.get_constraint_upper_bounds(), 0.0)


def test_get_solver_stats():
    """Per-tick stats are exposed programmatically after a TPU_SQP solve."""
    ocp = di.build(di.make_config(horizon=8, dt=0.01, step_num=4))
    assert ocp.get_solver_stats() == {}
    frame = np.zeros(di.FRAME, np.float32)
    ref = np.zeros(ocp.reference_size, np.float32)
    ocp.compute_optimal_trajectory(frame, ref)
    stats = ocp.get_solver_stats()
    assert stats["qp_iters"].shape == (4,)
    assert stats["f_history"].shape == (4,)
    assert stats["step_norms"].shape == (4,)
    assert np.isfinite(stats["objective"])


def test_solver_stats_qp_status_flags():
    """Per-step QP status flags surface for the per-scenario path."""
    cfg = di.make_config(
        horizon=8, dt=0.01, step_num=4,
        shared_system=False,  # force the per-scenario path
    )
    ocp = di.build(cfg)
    frame = np.zeros(di.FRAME, np.float32)
    ref = np.zeros(ocp.reference_size, np.float32)
    ocp.compute_optimal_trajectory(frame, ref)
    stats = ocp.get_solver_stats()
    assert stats["qp_converged"].shape == (4,)
    assert stats["qp_converged"].all()  # benign LQ problem: all QPs solve
    assert not stats["qp_prim_inf"].any()
    assert not stats["qp_dual_inf"].any()
