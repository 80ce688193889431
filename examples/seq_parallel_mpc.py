#!/usr/bin/env python
"""Sequence-parallel MPC: the horizon sharded across the device mesh.

Runs the cart-pole swing-up with the trajectory stages distributed over all
available devices (1-D mesh), then a scenarios x horizon 2-D mesh — the OCP
analog of data x context parallelism.  The user flow is the reference's
(build OCP -> solve per tick): :class:`HorizonShardedSolver` derives the
stage structure, bounds, pinning, and settings from the built OCP.
Works on the virtual CPU mesh:

  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \\
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
  python examples/seq_parallel_mpc.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def build_ocp(H, DT):
    from optimal_control_problem_tpu.models import cartpole

    return cartpole.build(
        cartpole.make_config(
            horizon=H,
            dt=DT,
            alpha=0.3,
            step_num=6,
            # Round-based distributed rho adaptation recovers from a poor
            # rho start (each round refactorizes the SPIKE partition).
            ADMM_settings={
                "method": "banded",
                "eps_abs": 1e-3,
                "eps_rel": 1e-3,
                "adaptive_rho": True,
                "rho": 0.05,
                "max_iter": 2000,
            },
        ),
        stagewise=True,
    )


def main():
    import jax

    from optimal_control_problem_tpu.models import cartpole
    from optimal_control_problem_tpu.parallel import (
        HorizonShardedSolver,
        make_mesh,
    )

    H, DT = 16, 0.04
    n_dev = len(jax.devices())
    print(f"devices: {n_dev}, horizon: {H} ({H // n_dev} stages/device)")
    ocp = build_ocp(H, DT)
    ref = np.array([np.pi])

    # NOTE: run the 2-D layout first, then the 1-D solve on a submesh —
    # XLA's CPU collective runtime deadlocks when a full-device 1-D program
    # is followed by a differently-shaped full-device mesh in one process.
    if n_dev % 2 == 0 and n_dev >= 4:
        B = 4
        mesh2 = make_mesh(("b", "h"), shape=(2, n_dev // 2))
        sharded2 = HorizonShardedSolver(ocp, mesh2, axis="h", batch_axis="b")
        frames = np.stack(
            [cartpole.initial_state(th=0.2 + 0.15 * b) for b in range(B)]
        )
        xb = sharded2.compute_optimal_trajectory(
            frames, np.tile(ref[None], (B, 1))
        )
        print(
            f"2-D (scenarios x horizon) mesh {dict(mesh2.shape)}: "
            f"result {np.asarray(xb).shape}, "
            f"finite={np.isfinite(np.asarray(xb)).all()}"
        )

    sub = list(jax.devices())[: max(2, n_dev // 2)]
    mesh = make_mesh(("h",), devices=sub)
    sharded = HorizonShardedSolver(ocp, mesh)
    traj = np.asarray(
        sharded.compute_optimal_trajectory(
            cartpole.initial_state(th=0.5), ref
        )
    )
    stats = sharded.get_solver_stats()
    print(
        f"1-D horizon-sharded solve over {len(sub)} devices: "
        f"finite={np.isfinite(traj).all()}, "
        f"th range [{traj[:, 2].min():+.2f}, {traj[:, 2].max():+.2f}], "
        f"ADMM iters/SQP step: {stats['qp_iters']}"
    )


if __name__ == "__main__":
    main()
