"""Tests for checkpoint/resume and solver-artifact serialization."""

import numpy as np
import pytest

from optimal_control_problem_tpu import sym as S
from optimal_control_problem_tpu import SQPOptimizationSolver, SQPOptions
from optimal_control_problem_tpu.solvers.admm import ADMMSettings
from optimal_control_problem_tpu.utils.serialization import (
    export_solver,
    import_solver,
    load_solver_state,
    save_solver_state,
)


def make_solver():
    x = S.sym("x", 2)
    nlp = {"x": x, "f": x[0] ** 2 + x[1] ** 2, "g": x[0] + x[1] - 1.0}
    return SQPOptimizationSolver(
        nlp,
        SQPOptions(
            max_iter=5, alpha=0.5, admm=ADMMSettings(eps_abs=1e-4, eps_rel=1e-4)
        ),
    )


ARG = {
    "lbx": np.array([-50.0, -100.0]),
    "ubx": np.array([50.0, 100.0]),
    "lbg": np.array([0.0]),
    "ubg": np.array([0.0]),
}


def test_warm_start_checkpoint_roundtrip(tmp_path):
    s1 = make_solver()
    s1.get_optimal_solution(ARG)
    ckpt = tmp_path / "state.npz"
    save_solver_state(s1, str(ckpt))

    s2 = make_solver()
    load_solver_state(s2, str(ckpt))
    # Resumed solver continues exactly where s1 would.
    r1 = s1.get_optimal_solution(ARG)
    r2 = s2.get_optimal_solution(ARG)
    np.testing.assert_allclose(np.asarray(r1["x"]), np.asarray(r2["x"]), atol=1e-6)


def test_export_import_solver_artifact(tmp_path):
    s = make_solver()
    path = tmp_path / "solver.bin"
    import jax.numpy as jnp

    args = (
        jnp.zeros(2, jnp.float32),  # x_init
        jnp.zeros(0, jnp.float32),  # p
        jnp.asarray(ARG["lbx"], jnp.float32),
        jnp.asarray(ARG["ubx"], jnp.float32),
        jnp.asarray(ARG["lbg"], jnp.float32),
        jnp.asarray(ARG["ubg"], jnp.float32),
        jnp.zeros(2, jnp.float32),  # qp_x
        jnp.zeros(3, jnp.float32),  # qp_y
    )
    export_solver(s.solve_fn, args, str(path))
    assert path.stat().st_size > 0

    loaded = import_solver(str(path))
    res_direct = s.solve_fn(*args)
    res_loaded = loaded(*args)
    np.testing.assert_allclose(
        np.asarray(res_direct.x), np.asarray(res_loaded[0]), atol=1e-6
    )
