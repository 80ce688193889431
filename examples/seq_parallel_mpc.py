#!/usr/bin/env python
"""Sequence-parallel MPC: the horizon sharded across the device mesh.

Runs the cart-pole swing-up with the trajectory stages distributed over all
available devices (1-D mesh), then a scenarios x horizon 2-D mesh — the OCP
analog of data x context parallelism.  Works on the virtual CPU mesh:

  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \\
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
  python examples/seq_parallel_mpc.py
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from optimal_control_problem_tpu.config import OCPConfig
    from optimal_control_problem_tpu.models import cartpole
    from optimal_control_problem_tpu.parallel import make_mesh
    from optimal_control_problem_tpu.parallel.seq_sqp import (
        sqp_solve_seq_parallel,
    )
    from optimal_control_problem_tpu.solvers.admm import ADMMSettings

    H, DT = 16, 0.04
    n_dev = len(jax.devices())
    print(f"devices: {n_dev}, horizon: {H} ({H // n_dev} stages/device)")

    ss = dataclasses.replace(
        cartpole.stage_structure(H, DT), ref_frame_size=1
    )
    occ = OCPConfig(cartpole.make_config(horizon=H, dt=DT))
    lx = occ.lower_bounds_flat().reshape(H, cartpole.FRAME).astype(np.float32)
    ux = occ.upper_bounds_flat().reshape(H, cartpole.FRAME).astype(np.float32)
    frame = cartpole.initial_state(th=0.5).astype(np.float32)
    lx[0] = frame
    ux[0] = frame
    ref = np.full((H, 1), np.pi, np.float32)
    # Round-based distributed rho adaptation recovers from a poor rho start
    # (each round refactorizes the SPIKE partition with the rescaled rho).
    admm = ADMMSettings(
        eps_abs=1e-3, eps_rel=1e-3, adaptive_rho=True, rho=0.05, max_iter=2000
    )

    # NOTE: run the 2-D layout first, then the 1-D solve on a submesh —
    # XLA's CPU collective runtime deadlocks when a full-device 1-D program
    # is followed by a differently-shaped full-device mesh in one process.
    if n_dev % 2 == 0 and n_dev >= 4:
        B = 4
        mesh2 = make_mesh(("b", "h"), shape=(2, n_dev // 2))
        lxb = np.tile(lx[None], (B, 1, 1))
        uxb = np.tile(ux[None], (B, 1, 1))
        for b in range(B):
            fr = cartpole.initial_state(th=0.2 + 0.15 * b).astype(np.float32)
            lxb[b, 0] = fr
            uxb[b, 0] = fr
        xb, _, _ = sqp_solve_seq_parallel(
            ss,
            jnp.zeros((B, H, cartpole.FRAME), jnp.float32),
            jnp.asarray(np.tile(ref[None], (B, 1, 1))),
            jnp.asarray(lxb),
            jnp.asarray(uxb),
            sqp_iters=6,
            alpha=0.3,
            admm=admm,
            mesh=mesh2,
            axis="h",
            batch_axis="b",
        )
        print(
            f"2-D (scenarios x horizon) mesh {dict(mesh2.shape)}: "
            f"result {np.asarray(xb).shape}, finite={np.isfinite(np.asarray(xb)).all()}"
        )

    sub = list(jax.devices())[: max(2, n_dev // 2)]
    mesh = make_mesh(("h",), devices=sub)
    x, its, _status = sqp_solve_seq_parallel(
        ss,
        jnp.zeros((H, cartpole.FRAME), jnp.float32),
        jnp.asarray(ref),
        jnp.asarray(lx),
        jnp.asarray(ux),
        sqp_iters=6,
        alpha=0.3,
        admm=admm,
        mesh=mesh,
        axis="h",
    )
    traj = np.asarray(x)
    print(
        f"1-D horizon-sharded solve over {len(sub)} devices: "
        f"finite={np.isfinite(traj).all()}, "
        f"th range [{traj[:, 2].min():+.2f}, {traj[:, 2].max():+.2f}], "
        f"ADMM iters/SQP step: {np.asarray(its)}"
    )


if __name__ == "__main__":
    main()
