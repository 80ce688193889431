#!/usr/bin/env python
"""Unicycle waypoint tracking with half-space obstacle constraints.

Exercises ``add_inequality_constraint`` (reference
``OptimalControlProblem.cpp:448-465``) end to end: the robot tracks a
straight-line reference that passes THROUGH a keep-out half-space
``y <= 0.3`` (the constraint demands ``normal . p >= offset``, i.e.
``y >= 0.3`` is forbidden... here the obstacle is "stay below y=0.3" being
violated by a reference detour), and the closed-loop path must respect the
constraint while re-acquiring the waypoints.

Uses the stage structure, so gen_solver auto-selects the banded QP path.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/unicycle_obstacles.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from optimal_control_problem_tpu.controller import MPCController
from optimal_control_problem_tpu.models import unicycle


def main():
    H, dt = 30, 0.05
    # Keep-out: require  (0, -1) . (x, y) >= -0.3  <=>  y <= 0.3.
    halfspaces = (((0.0, -1.0), -0.3),)
    cfg = unicycle.make_config(horizon=H, dt=dt, alpha=0.4, step_num=8)
    ocp = unicycle.build(cfg, halfspaces=halfspaces, stagewise=True)
    assert ocp._solver.options.admm.method == "banded"  # auto-selected
    ctl = MPCController(ocp, control_slice=slice(3, 5))

    s = unicycle.initial_state(y=-0.2)
    max_y = -np.inf
    for tick in range(80):
        t = tick * dt
        # Reference drifts upward, trying to drag the robot into y > 0.3.
        tt = t + dt * np.arange(H)
        ref = np.stack([tt, 0.2 + 0.5 * tt], axis=1).reshape(-1)
        u = ctl.step(np.asarray(s, np.float64), ref)
        v, om = float(u[0]), float(u[1])
        x, y, th = s[0], s[1], s[2]
        s = np.array([x + dt * v * np.cos(th), y + dt * v * np.sin(th),
                      th + dt * om, v, om])
        max_y = max(max_y, s[1])
        if tick % 16 == 0:
            print(f"t={t:5.2f}s  pos=({s[0]:+.2f},{s[1]:+.2f})  "
                  f"v={v:+.2f} om={om:+.2f}")
    print(f"max y over the run: {max_y:.3f} (keep-out starts at 0.3)")
    assert max_y < 0.35, "obstacle constraint violated"


if __name__ == "__main__":
    main()
