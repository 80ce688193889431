"""Tests for the profiling utilities (the reference's per-phase split)."""

import numpy as np

from optimal_control_problem_tpu import SQPOptimizationSolver, SQPOptions
from optimal_control_problem_tpu import sym as S
from optimal_control_problem_tpu.solvers.admm import ADMMSettings
from optimal_control_problem_tpu.utils.timing import Timer, profile_solver


def test_timer_phases():
    t = Timer()
    with t.phase("a"):
        sum(range(1000))
    with t.phase("b"):
        sum(range(1000))
    with t.phase("a"):
        sum(range(1000))
    assert t.counts["a"] == 2 and t.counts["b"] == 1
    report = t.report()
    assert "a:" in report and "%" in report


def test_profile_solver_reports_split():
    x = S.sym("x", 2)
    nlp = {"x": x, "f": x[0] ** 2 + x[1] ** 2, "g": x[0] + x[1] - 1.0}
    solver = SQPOptimizationSolver(
        nlp,
        SQPOptions(max_iter=4, alpha=0.5, admm=ADMMSettings(max_iter=500)),
    )
    arg = {
        "lbx": np.array([-5.0, -5.0]),
        "ubx": np.array([5.0, 5.0]),
        "lbg": np.array([0.0]),
        "ubg": np.array([0.0]),
    }
    stats = profile_solver(solver, arg, repeats=3)
    # The reference's verbose breakdown (SQPOptimizationSolver.cpp:204-209):
    # local-system vs QP time plus percentage split.
    for key in ("local_system_ms", "qp_ms", "solve_ms", "qp_pct", "local_system_pct"):
        assert key in stats and stats[key] >= 0.0
    assert abs(stats["local_system_pct"] + stats["qp_pct"] - 100.0) < 1e-6
