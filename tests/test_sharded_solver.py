"""HorizonShardedSolver: the reference-shaped MPC front-end over the
sequence-parallel SQP engine, from a YAML-built OCP to a horizon-sharded
solve with no hand-assembly (VERDICT round-2 item 4)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optimal_control_problem_tpu.config import load_config
from optimal_control_problem_tpu.models import cartpole
from optimal_control_problem_tpu.parallel import (
    HorizonShardedSolver,
    make_mesh,
)

YAML = os.path.join(os.path.dirname(__file__), "..", "configs", "cartpole.yaml")


def yaml_ocp(step_num=6, max_iter=800):
    """Cart-pole from its shipped YAML (horizon 20), stage structure
    registered — the same build path a user takes.  The ADMM budget is
    trimmed for CPU-mesh test speed (settings the YAML schema exposes)."""
    node = load_config(YAML)
    node["solver_settings"]["SQP_settings"] = {
        "alpha": 0.3,
        "step_num": step_num,
    }
    node["solver_settings"]["ADMM_settings"] = {
        "method": "banded",
        "max_iter": max_iter,
        "adaptive_rho": False,
        "rho": 0.05,
        "eps_abs": 1e-4,
        "eps_rel": 1e-4,
    }
    return cartpole.build(node, stagewise=True)


def test_yaml_built_ocp_horizon_sharded():
    """YAML horizon 20 over a 4-device 'h' mesh (5 stages/device) must agree
    with the same OCP solved through the single-device front-end."""
    ocp = yaml_ocp()
    mesh = make_mesh(("h",), shape=(4,), devices=jax.devices()[:4])
    sharded = HorizonShardedSolver(ocp, mesh)

    frame = cartpole.initial_state(th=0.4)
    ref = np.array([np.pi])
    traj = sharded.compute_optimal_trajectory(frame, ref)
    assert traj.shape == (20, cartpole.FRAME)
    assert np.isfinite(np.asarray(traj)).all()
    # First-frame pinning survived the sharded solve.  Damped SQP
    # approaches the pinned bound geometrically from x0 = 0 (exactly the
    # reference's fixed alpha*dx update), so the residual gap after k
    # steps is (1-alpha)^k of the initial one.
    pin_tol = (1 - 0.3) ** 6 * np.abs(frame).max() * 1.5 + 1e-3
    assert np.abs(np.asarray(traj[0]) - frame).max() < pin_tol

    # Single-device reference: the same YAML-built OCP through the standard
    # front-end.  Both run damped SQP + banded OSQP ADMM; QP warm-start
    # threading differs, so agreement is to QP-tolerance scale.
    ocp_ref = yaml_ocp()
    ocp_ref.compute_optimal_trajectory(frame, ref)
    frames_ref = ocp_ref.get_optimal_frames()
    np.testing.assert_allclose(np.asarray(traj), frames_ref, atol=5e-2)

    stats = sharded.get_solver_stats()
    assert stats["qp_iters"].shape == (6,)
    assert stats["qp_status"].shape == (6, 3)
    assert not stats["qp_status"][:, 1:].any()  # no infeasibility certs

    # get_optimal_trajectory mirrors the reference's flat accessor.
    flat = sharded.get_optimal_trajectory()
    np.testing.assert_array_equal(
        np.asarray(flat), np.asarray(traj).reshape(-1)
    )


def test_second_tick_warm_start():
    """Tick 2 warm-starts from tick 1's trajectory (cpp:102-113 semantics)
    and converges at least as tightly."""
    ocp = yaml_ocp(step_num=4)
    mesh = make_mesh(("h",), shape=(4,), devices=jax.devices()[:4])
    sharded = HorizonShardedSolver(ocp, mesh)
    frame = cartpole.initial_state(th=0.3)
    ref = np.array([np.pi])
    t1 = np.asarray(sharded.compute_optimal_trajectory(frame, ref))
    t2 = np.asarray(sharded.compute_optimal_trajectory(frame, ref))
    assert np.isfinite(t2).all()
    # Same measured state + warm start => the iterate moves less on tick 2.
    assert np.linalg.norm(t2 - t1) < np.linalg.norm(t1) + 1e-6


def test_batched_scenarios_2d_mesh():
    """(scenario b) x (horizon h) 2-D mesh through the front-end: per-
    scenario trajectories and per-scenario QP status triples."""
    ocp = yaml_ocp(step_num=3, max_iter=400)
    mesh = make_mesh(("b", "h"), shape=(2, 4))
    sharded = HorizonShardedSolver(ocp, mesh, axis="h", batch_axis="b")
    B = 4
    frames = np.stack(
        [cartpole.initial_state(th=0.2 + 0.1 * b) for b in range(B)]
    )
    refs = np.full((B, 1), np.pi)
    trajs = sharded.compute_optimal_trajectory(frames, refs)
    assert trajs.shape == (B, 20, cartpole.FRAME)
    assert np.isfinite(np.asarray(trajs)).all()
    pin_tol = (1 - 0.3) ** 3 * np.abs(frames).max() * 1.5 + 1e-3
    for b in range(B):
        assert np.abs(np.asarray(trajs[b, 0]) - frames[b]).max() < pin_tol
    stats = sharded.get_solver_stats()
    # Full per-scenario certificates (ADVICE round-2): (B, sqp_iters, 3).
    assert stats["qp_status"].shape == (B, 3, 3)


def test_validation_errors():
    ocp = yaml_ocp()
    mesh8 = make_mesh(("h",))  # 8 devices: 20 % 8 != 0
    with pytest.raises(ValueError, match="split into"):
        HorizonShardedSolver(ocp, mesh8)
    mesh = make_mesh(("h",), shape=(4,), devices=jax.devices()[:4])
    with pytest.raises(ValueError, match="no axis"):
        HorizonShardedSolver(ocp, mesh, axis="z")
    # Non-stagewise OCP is rejected.
    plain = cartpole.build(
        cartpole.make_config(horizon=20, dt=0.02), stagewise=False
    )
    with pytest.raises(ValueError, match="stage-structured"):
        HorizonShardedSolver(plain, mesh)
