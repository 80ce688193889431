#!/usr/bin/env python
"""Closed-loop MPC demo: double-integrator tracking a circle.

Mirrors the reference's intended usage loop (robot control at dt=0.005,
SURVEY.md section 3.2): measure state -> computeOptimalTrajectory -> apply
first control -> advance plant.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from optimal_control_problem_tpu.models import double_integrator as di


def main():
    H, dt = 20, 0.005
    cfg = di.make_config(horizon=H, dt=dt, alpha=0.5, step_num=10)
    ocp = di.build(cfg)

    pos = np.array([1.5, 0.0])
    vel = np.zeros(2)
    acc = np.zeros(2)

    for tick in range(200):
        t = tick * dt
        ref = di.reference_circle(H, dt, t0=t)
        frame = np.concatenate([pos, vel, acc])
        ocp.compute_optimal_trajectory(frame, ref)
        plan = ocp.get_optimal_frames()
        # Frame 0 is fully pinned (including control); apply the first FREE
        # control, frame 1's.
        u = np.asarray(plan[1, 4:6], dtype=np.float64)
        pos = pos + dt * vel
        vel = vel + dt * u
        acc = u
        if tick % 20 == 0:
            target = ref[:2]
            err = np.linalg.norm(pos - target)
            print(f"t={t:6.3f}s  pos=({pos[0]:+.3f},{pos[1]:+.3f})  err={err:.4f}")


if __name__ == "__main__":
    main()
