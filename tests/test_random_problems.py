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


@pytest.mark.parametrize("seed", range(4))
def test_random_infeasible_qp_certified(seed):
    """Random QP + a pair of contradictory rows: prim_inf must trigger."""
    from optimal_control_problem_tpu.solvers.admm import ADMMSettings, admm_solve

    rng = np.random.default_rng(100 + seed)
    n, m = 6, 8
    L = rng.normal(size=(n, n))
    P = (L @ L.T + 0.5 * np.eye(n)).astype(np.float32)
    q = rng.normal(size=n).astype(np.float32)
    A = rng.normal(size=(m, n)).astype(np.float32)
    l = (A @ rng.normal(size=n) - 1.0).astype(np.float32)
    u = l + 2.0
    # Contradiction: duplicate row 0 with a disjoint equality band.
    A = np.vstack([A, A[0:1]]).astype(np.float32)
    l = np.concatenate([l, [u[0] + 5.0]]).astype(np.float32)
    u = np.concatenate([u, [u[0] + 5.0]]).astype(np.float32)
    l[0] = u[0] - 0.0  # row 0 equality at u[0]; row m demands u[0]+5

    sol = admm_solve(
        *map(jnp.asarray, (P, q, A, l, u)),
        ADMMSettings(method="condensed", max_iter=4000),
    )
    assert not bool(sol.converged), seed
    assert bool(sol.prim_inf), seed


@pytest.mark.parametrize("seed", range(4))
def test_random_unbounded_qp_certified(seed):
    """PSD P with a null direction that q pushes along and constraints
    leave open: dual_inf must trigger."""
    from optimal_control_problem_tpu.solvers.admm import ADMMSettings, admm_solve

    rng = np.random.default_rng(200 + seed)
    n = 5
    # P has a null space spanned by e_n.
    L = rng.normal(size=(n - 1, n - 1))
    P = np.zeros((n, n), np.float32)
    P[: n - 1, : n - 1] = (L @ L.T + 0.5 * np.eye(n - 1)).astype(np.float32)
    q = np.zeros(n, np.float32)
    q[-1] = 1.0  # pushes x_n -> -inf
    # Constraints only touch the first n-1 coordinates.
    A = np.concatenate(
        [rng.normal(size=(3, n - 1)).astype(np.float32), np.zeros((3, 1), np.float32)],
        axis=1,
    )
    c = A[:, : n - 1] @ rng.normal(size=n - 1)
    l = (c - 1.0).astype(np.float32)
    u = (c + 1.0).astype(np.float32)
    sol = admm_solve(
        *map(jnp.asarray, (P, q, A, l, u)),
        ADMMSettings(method="condensed", max_iter=4000),
    )
    assert not bool(sol.converged), seed
    assert bool(sol.dual_inf), seed
