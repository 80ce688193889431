"""Property-style tests: random LQ tracking problems through the full stack.

For randomly generated (but well-posed) linear-dynamics tracking problems,
the converged TPU solution must satisfy the KKT feasibility conditions and
agree with the f64 host solver — broader coverage than the hand-picked
golden cases.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from optimal_control_problem_tpu import OptimalControlProblem, SQPOptions
from optimal_control_problem_tpu.problem import SolverSettings
from optimal_control_problem_tpu.solvers.reference import solve_nlp_host
from optimal_control_problem_tpu.utils.diagnostics import kkt_residuals


def random_lq_ocp(seed, H=6, nx=3, nu=2):
    """Random stable linear dynamics + PSD tracking cost as an OCP."""
    rng = np.random.default_rng(seed)
    fs = nx + nu
    A = np.eye(nx) + 0.1 * rng.normal(size=(nx, nx))
    A = 0.95 * A / max(1.0, np.max(np.abs(np.linalg.eigvals(A))))
    B = 0.2 * rng.normal(size=(nx, nu))
    w_x = rng.uniform(0.5, 2.0, nx)
    w_u = rng.uniform(0.01, 0.1, nu)

    node = {
        "discretization_settings": {"dt": 0.05, "horizon": H},
        "solver_settings": {
            **SolverSettings.default_node("TPU_SQP"),
            "SQP_settings": {"alpha": 1.0, "step_num": 6},
            "formulation": "reduced",
            "ADMM_settings": {
                "method": "condensed",
                "eps_abs": 1e-4,
                "eps_rel": 1e-4,
            },
        },
        "OCP_variables": [
            {
                "name": "state",
                "size": nx,
                "lower_bound": [-5.0] * nx,
                "upper_bound": [5.0] * nx,
            },
            {
                "name": "input",
                "size": nu,
                "lower_bound": [-3.0] * nu,
                "upper_bound": [3.0] * nu,
            },
        ],
    }
    ocp = OptimalControlProblem(node)
    ocp.set_reference(nx)

    def cost(X, P):
        fr = X.reshape(H, fs)
        s, u = fr[:, :nx], fr[:, nx:]
        return jnp.sum(jnp.asarray(w_x) * jnp.square(s - P[None, :])) + jnp.sum(
            jnp.asarray(w_u) * jnp.square(u)
        )

    ocp.add_scalar_cost(cost)
    Aj, Bj = jnp.asarray(A, jnp.float32), jnp.asarray(B, jnp.float32)

    def dynamics(X, P):
        fr = X.reshape(H, fs)
        s, u = fr[:, :nx], fr[:, nx:]
        nxt = s[:-1] @ Aj.T + u[:-1] @ Bj.T
        return (fr[1:, :nx] - nxt).reshape(-1)

    ocp.add_equation_constraint("dyn", dynamics)
    ocp.gen_solver()
    return ocp, fs, nx


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_random_lq_kkt_and_host_agreement(seed):
    rng = np.random.default_rng(100 + seed)
    H = 6
    ocp, fs, nx = random_lq_ocp(seed, H=H)
    assert ocp.solver.shared_system, "LQ problem must auto-detect as shared"

    frame = np.zeros(fs)
    frame[:nx] = rng.uniform(-0.5, 0.5, nx)
    target = rng.uniform(-0.5, 0.5, nx)
    for _ in range(3):
        ocp.compute_optimal_trajectory(frame, target)
    x_tpu = np.asarray(ocp.get_optimal_trajectory())

    cfg = ocp.ocp_config
    lbx = cfg.lower_bounds_flat().copy()
    ubx = cfg.upper_bounds_flat().copy()
    lbx[:fs] = frame
    ubx[:fs] = frame
    f_fn, g_fn = ocp.nlp_functions
    stats = kkt_residuals(
        f_fn,
        g_fn,
        x_tpu,
        target,
        lbx,
        ubx,
        ocp.get_constraint_lower_bounds(),
        ocp.get_constraint_upper_bounds(),
    )
    assert stats["box_violation"] < 5e-3
    assert stats["constraint_violation"] < 5e-3

    host = solve_nlp_host(
        f_fn,
        g_fn,
        np.zeros(cfg.num_variables),
        target,
        lbx,
        ubx,
        ocp.get_constraint_lower_bounds(),
        ocp.get_constraint_upper_bounds(),
    )
    # Objectives agree (states/controls may sit in weakly-determined
    # directions at QP tolerance).
    f_tpu = float(f_fn(jnp.asarray(x_tpu), jnp.asarray(target, jnp.float32)))
    assert abs(f_tpu - float(host["f"])) <= 1e-3 * max(1.0, abs(float(host["f"])))
