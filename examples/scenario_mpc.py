#!/usr/bin/env python
"""Scenario-consensus MPC across a device mesh.

Robust MPC under uncertainty: sample B scenarios of the measured state
(sensor noise), solve all of them in one sharded batched SQP program, and
apply the consensus (mean) first control — the ICI-collective pattern from
SURVEY.md section 2 ("Consensus / scenario parallel").

Runs on any machine: set
``JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8``
(and on this session's image, empty ``PALLAS_AXON_POOL_IPS``) for an
8-device virtual mesh, or run on a real TPU slice unchanged.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax

    from optimal_control_problem_tpu.models import double_integrator as di
    from optimal_control_problem_tpu.parallel import (
        BatchedSolver,
        DistributedSolver,
    )

    H, dt = 10, 0.02
    B = 64  # scenarios (sharded over all devices)
    noise = 0.05

    ocp = di.build(di.make_config(horizon=H, dt=dt, alpha=0.5, step_num=8))
    dist = DistributedSolver(BatchedSolver(ocp))
    print(f"devices: {dist.n_devices}, scenarios: {B}")

    rng = np.random.default_rng(0)
    pos = np.array([1.0, -0.5])
    vel = np.zeros(2)
    acc = np.zeros(2)
    target = np.zeros(2)
    refs = np.tile(np.tile(target, H)[None, :], (B, 1)).astype(np.float32)
    state = dist.init_state(B)

    for tick in range(50):
        # Sample measurement scenarios around the nominal state.
        frames = np.tile(
            np.concatenate([pos, vel, acc])[None, :], (B, 1)
        ).astype(np.float32)
        frames[:, 0:4] += noise * rng.normal(size=(B, 4)).astype(np.float32)

        trajs, objs, state = dist.solve(frames, refs, state)
        # Consensus first control over ALL scenarios (psum over the mesh);
        # frame 0 is pinned, so the first free control is frame 1's.
        fs = di.FRAME
        u = np.asarray(
            dist.consensus_first_control(trajs[:, fs : 2 * fs], slice(4, 6))
        )

        pos = pos + dt * vel
        vel = vel + dt * u
        acc = u
        if tick % 10 == 0:
            print(
                f"tick {tick:3d}  pos=({pos[0]:+.3f},{pos[1]:+.3f})  "
                f"|u|={np.linalg.norm(u):.2f}  err={np.linalg.norm(pos - target):.4f}"
            )

    assert np.linalg.norm(pos - target) < 0.5
    print("consensus MPC converged toward target")


if __name__ == "__main__":
    main()
