#!/usr/bin/env python
"""Quadrotor-12D horizon-100 trajectory optimization (BASELINE config 4).

Demonstrates the long-horizon stack: stage-structured problem declaration
(per-stage vmapped derivatives) + the block-tridiagonal (banded) ADMM —
no dense operators at n = 1600.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    from optimal_control_problem_tpu.models import quadrotor
    from optimal_control_problem_tpu.utils.diagnostics import kkt_residuals

    H = 100
    cfg = quadrotor.make_config(
        horizon=H,
        dt=0.02,
        alpha=0.3,
        step_num=5,
        formulation="reduced",
        ADMM_settings={"method": "banded", "max_iter": 250},
    )
    ocp = quadrotor.build(cfg, stagewise=True)
    print(f"variables: {ocp.ocp_config.num_variables}, constraints: {ocp.num_constraints}")

    frame = quadrotor.initial_state(pos=(0.5, -0.3, 0.8))
    target = (0.0, 0.0, 1.0)
    ref = quadrotor.reference_hover(H, target)
    for tick in range(4):
        ocp.compute_optimal_trajectory(frame, ref)
        plan = ocp.get_optimal_frames()
        err = np.linalg.norm(plan[-1, 0:3] - np.asarray(target))
        print(f"tick {tick}: terminal position error {err:.4f}")

    f_fn, g_fn = ocp.nlp_functions
    cfg_ = ocp.ocp_config
    lbx = cfg_.lower_bounds_flat().copy()
    ubx = cfg_.upper_bounds_flat().copy()
    lbx[: quadrotor.FRAME] = frame
    ubx[: quadrotor.FRAME] = frame
    stats = kkt_residuals(
        f_fn,
        g_fn,
        np.asarray(ocp.get_optimal_trajectory()),
        ref,
        lbx,
        ubx,
        ocp.get_constraint_lower_bounds(),
        ocp.get_constraint_upper_bounds(),
    )
    print("solution quality:", {k: round(v, 5) for k, v in stats.items()})
    assert stats["constraint_violation"] < 0.05


if __name__ == "__main__":
    main()
