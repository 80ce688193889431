"""Tests for constraint reports and KKT diagnostics."""

import numpy as np

from optimal_control_problem_tpu.models import double_integrator as di
from optimal_control_problem_tpu.utils.diagnostics import (
    constraint_report,
    dump_constraints_csv,
    kkt_residuals,
)


def test_constraint_report_and_csv(tmp_path):
    H = 6
    ocp = di.build(di.make_config(horizon=H, dt=0.05, alpha=0.8, step_num=6))
    frame = di.initial_state(pos=(0.3, 0.0))
    ref = np.zeros(H * 2)
    for _ in range(3):
        ocp.compute_optimal_trajectory(frame, ref)
    X = np.asarray(ocp.get_optimal_trajectory())
    rows = constraint_report(ocp, X, ref)
    assert len(rows) == (H - 1) * 4
    assert all(r["name"] == "dynamics" for r in rows)
    # Converged MPC solution: dynamics nearly satisfied.
    assert max(r["violation"] for r in rows) < 1e-2

    path = tmp_path / "constraints.csv"
    dump_constraints_csv(str(path), ocp, X, ref)
    text = path.read_text()
    assert text.startswith("name,index,value,lower,upper,violation")
    assert text.count("dynamics") == (H - 1) * 4


def test_kkt_residuals():
    H = 6
    ocp = di.build(di.make_config(horizon=H, dt=0.05, alpha=0.8, step_num=6))
    frame = di.initial_state(pos=(0.3, 0.0))
    ref = np.zeros(H * 2)
    for _ in range(3):
        ocp.compute_optimal_trajectory(frame, ref)
    X = np.asarray(ocp.get_optimal_trajectory())
    f_fn, g_fn = ocp.nlp_functions
    cfg = ocp.ocp_config
    lbx = cfg.lower_bounds_flat().copy()
    ubx = cfg.upper_bounds_flat().copy()
    lbx[:6] = frame
    ubx[:6] = frame
    res = kkt_residuals(
        f_fn,
        g_fn,
        X,
        ref,
        lbx,
        ubx,
        ocp.get_constraint_lower_bounds(),
        ocp.get_constraint_upper_bounds(),
    )
    assert res["box_violation"] < 1e-2
    assert res["constraint_violation"] < 1e-2
    assert res["objective"] >= 0.0
