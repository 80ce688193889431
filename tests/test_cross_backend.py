"""Cross-backend consistency: the same NLPs through every solver backend.

The reference offers four backends but no way to check them against each
other (SURVEY.md section 4).  Here the golden cases run through the jitted
TPU SQP, the f64 host interior-point and SLSQP backends, and (where the
problem is a QP) the runtime-compiled C++ ADMM oracle — all must agree.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from optimal_control_problem_tpu import SQPOptimizationSolver, SQPOptions
from optimal_control_problem_tpu import sym as S
from optimal_control_problem_tpu.solvers.admm import ADMMSettings
from optimal_control_problem_tpu.solvers.reference import solve_nlp_host
from optimal_control_problem_tpu.solvers.sqp import normalize_nlp

CASES = []


def case(name, expected, lbx, ubx, lbg=(), ubg=(), p=()):
    def deco(build):
        CASES.append((name, build, expected, lbx, ubx, lbg, ubg, p))
        return build

    return deco


@case("equality_qp", [0.5, 0.5], [-50, -100], [50, 100], [0.0], [0.0])
def _c1():
    x = S.sym("x", 2)
    return {"x": x, "f": x[0] ** 2 + x[1] ** 2, "g": x[0] + x[1] - 1.0}


@case("unconstrained", [3.0, -2.0], [-50, -100], [50, 100], [0.0], [10.0])
def _c2():
    x = S.sym("x", 2)
    # Dummy loose constraint so every backend sees the same structure.
    return {"x": x, "f": (x[0] - 3.0) ** 2 + (x[1] + 2.0) ** 2, "g": x[0] - x[1] + 5.0}


@case("active_ineq", [1.0, 2.0], [-100, -100], [100, 100], [1.0, 2.0], [np.inf, np.inf])
def _c4():
    x = S.sym("x", 2)
    return {"x": x, "f": x[0] ** 2 + x[1] ** 2, "g": S.vertcat(x[0], x[1])}


@case("box_clipped", [2.0, 3.0], [0, 0], [2, 3], [-10.0], [10.0])
def _c7():
    x = S.sym("x", 2)
    return {"x": x, "f": (x[0] - 3.0) ** 2 + (x[1] - 4.0) ** 2, "g": x[0] - x[1]}


@case(
    "parameterized", [5.0, 0.0], [-100, -100], [100, 100], [-10.0], [10.0], p=[5.0]
)
def _c6():
    x = S.sym("x", 2)
    p = S.sym("p", 1)
    return {"x": x, "f": (x[0] - p[0]) ** 2 + x[1] ** 2, "g": x[0] - x[1], "p": p}


@pytest.mark.parametrize(
    "name,build,expected,lbx,ubx,lbg,ubg,p",
    CASES,
    ids=[c[0] for c in CASES],
)
def test_all_backends_agree(name, build, expected, lbx, ubx, lbg, ubg, p):
    nlp = build()
    arrs = dict(
        lbx=np.asarray(lbx, np.float64),
        ubx=np.asarray(ubx, np.float64),
        lbg=np.asarray(lbg, np.float64),
        ubg=np.asarray(ubg, np.float64),
        p=np.asarray(p, np.float64),
    )

    # 1) jitted TPU SQP
    tpu = SQPOptimizationSolver(
        nlp,
        SQPOptions(
            max_iter=12,
            alpha=1.0,
            admm=ADMMSettings(eps_abs=1e-4, eps_rel=1e-4),
        ),
    )
    res_tpu = np.asarray(tpu.get_optimal_solution(arrs)["x"])

    # 2+3) host backends on the identical traced functions
    f_fn, g_fn, n_x, n_p, n_g = normalize_nlp(nlp)
    for method in ("trust-constr", "SLSQP"):
        res_host = solve_nlp_host(
            f_fn,
            g_fn,
            np.zeros(n_x),
            arrs["p"],
            arrs["lbx"],
            arrs["ubx"],
            arrs["lbg"],
            arrs["ubg"],
            method=method,
        )
        np.testing.assert_allclose(
            res_host["x"], expected, atol=1e-4, err_msg=f"{method} vs expected"
        )
    np.testing.assert_allclose(
        res_tpu, expected, atol=3e-3, err_msg="TPU_SQP vs expected"
    )


def test_native_oracle_agrees_on_qp():
    from optimal_control_problem_tpu.solvers.native import (
        native_admm_solve,
        native_available,
    )

    if not native_available():
        pytest.skip("no C++ toolchain")
    # equality_qp as an explicit QP for the native oracle.
    P = 2 * np.eye(2)
    q = np.zeros(2)
    A = np.vstack([np.eye(2), [[1.0, 1.0]]])
    l = np.array([-50.0, -100.0, 1.0])
    u = np.array([50.0, 100.0, 1.0])
    sol = native_admm_solve(P, q, A, l, u, eps_abs=1e-4, eps_rel=1e-4)
    assert sol.converged
    np.testing.assert_allclose(sol.x, [0.5, 0.5], atol=1e-3)
