"""The 8 golden QP/NLP cases from the reference's ``test/test.cpp``
(``/root/reference/test/test.cpp:9-214``), upgraded from print-and-eyeball to
exact-value asserts (SURVEY.md section 4), plus parity tests of the SQP
engine's damped fixed-iteration semantics.

The reference test file drives ``SQPOptimizationSolver`` directly with a
hand-built nlp dict — the same two-entry-point shape we preserve (raw NLP API
here; OCP builder API in test_problem.py).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from optimal_control_problem_tpu import SQPOptimizationSolver, SQPOptions
from optimal_control_problem_tpu.solvers.admm import ADMMSettings
from optimal_control_problem_tpu import sym as S

INF = np.inf

# Full steps + enough iterations to converge the (mostly quadratic) cases;
# the reference's shipped defaults (alpha=0.1, 10 steps) deliberately do NOT
# converge these — that damped semantics is pinned separately below.
OPTS = dict(
    max_iter=12,
    alpha=1.0,
    admm=ADMMSettings(eps_abs=1e-4, eps_rel=1e-4),
)


def make_solver(nlp, formulation="augmented", **kw):
    opts = {**OPTS, **kw, "formulation": formulation}
    return SQPOptimizationSolver(nlp, SQPOptions(**opts))


def arg_of(lbx, ubx, lbg=(), ubg=(), p=()):
    return {
        "lbx": np.asarray(lbx, np.float64),
        "ubx": np.asarray(ubx, np.float64),
        "lbg": np.asarray(lbg, np.float64),
        "ubg": np.asarray(ubg, np.float64),
        "p": np.asarray(p, np.float64),
    }


@pytest.fixture(params=["augmented", "reduced"])
def formulation(request):
    return request.param


def test_case1_equality_qp(formulation):
    # min x^2 + y^2  s.t. x + y = 1  -> (0.5, 0.5)   (test.cpp:13-36)
    x = S.sym("x", 2)
    nlp = {"x": x, "f": x[0] ** 2 + x[1] ** 2, "g": x[0] + x[1] - 1.0}
    solver = make_solver(nlp, formulation)
    res = solver.get_optimal_solution(arg_of([-50, -100], [50, 100], [0.0], [0.0]))
    np.testing.assert_allclose(res["x"], [0.5, 0.5], atol=2e-3)


def test_case2_unconstrained_qp(formulation):
    # min (x-3)^2 + (y+2)^2 -> (3, -2)   (test.cpp:39-59)
    x = S.sym("x", 2)
    nlp = {"x": x, "f": (x[0] - 3.0) ** 2 + (x[1] + 2.0) ** 2}
    solver = make_solver(nlp, formulation)
    res = solver.get_optimal_solution(arg_of([-50, -100], [50, 100]))
    np.testing.assert_allclose(res["x"], [3.0, -2.0], atol=2e-3)


def test_case3_inactive_inequality(formulation):
    # min (x-2)^2 + (y-3)^2  s.t. x + y >= 1 -> (2, 3)   (test.cpp:62-84)
    x = S.sym("x", 2)
    nlp = {"x": x, "f": (x[0] - 2.0) ** 2 + (x[1] - 3.0) ** 2, "g": x[0] + x[1] - 1.0}
    solver = make_solver(nlp, formulation)
    res = solver.get_optimal_solution(arg_of([-100, -100], [100, 100], [1.0], [INF]))
    np.testing.assert_allclose(res["x"], [2.0, 3.0], atol=2e-3)


def test_case4_active_inequalities(formulation):
    # min x^2 + y^2  s.t. x >= 1, y >= 2 -> (1, 2)   (test.cpp:87-110)
    x = S.sym("x", 2)
    nlp = {"x": x, "f": x[0] ** 2 + x[1] ** 2, "g": S.vertcat(x[0], x[1])}
    solver = make_solver(nlp, formulation)
    res = solver.get_optimal_solution(
        arg_of([-100, -100], [100, 100], [1.0, 2.0], [INF, INF])
    )
    np.testing.assert_allclose(res["x"], [1.0, 2.0], atol=2e-3)


def test_case5_mixed_equality_and_box(formulation):
    # min sum (x_i - i)^2  s.t. sum x = 5, x >= 0   (test.cpp:113-136)
    # true optimum: (2/3, 5/3, 8/3)
    x = S.sym("x", 3)
    nlp = {
        "x": x,
        "f": (x[0] - 1.0) ** 2 + (x[1] - 2.0) ** 2 + (x[2] - 3.0) ** 2,
        "g": x[0] + x[1] + x[2] - 5.0,
    }
    solver = make_solver(nlp, formulation)
    res = solver.get_optimal_solution(
        arg_of([0, 0, 0], [INF, INF, INF], [0.0], [0.0])
    )
    np.testing.assert_allclose(res["x"], [2 / 3, 5 / 3, 8 / 3], atol=3e-3)


def test_case6_parameterized(formulation):
    # min (x-p)^2 + y^2 with p=5 -> (5, 0)   (test.cpp:139-161)
    x = S.sym("x", 2)
    p = S.sym("p", 1)
    nlp = {"x": x, "f": (x[0] - p[0]) ** 2 + x[1] ** 2, "p": p}
    solver = make_solver(nlp, formulation)
    res = solver.get_optimal_solution(arg_of([-100, -100], [100, 100], p=[5.0]))
    np.testing.assert_allclose(res["x"], [5.0, 0.0], atol=2e-3)


def test_case7_box_clipped(formulation):
    # min (x-3)^2 + (y-4)^2 with x in [0,2], y in [0,3] -> (2, 3)  (test.cpp:164-185)
    x = S.sym("x", 2)
    nlp = {"x": x, "f": (x[0] - 3.0) ** 2 + (x[1] - 4.0) ** 2}
    solver = make_solver(nlp, formulation)
    res = solver.get_optimal_solution(arg_of([0, 0], [2, 3]))
    np.testing.assert_allclose(res["x"], [2.0, 3.0], atol=2e-3)


def test_case8_nonconvex(formulation):
    # min x^2 - y^2  s.t. x^2 + y^2 <= 1   (test.cpp:188-211)
    # From the zero start both the reference engine and ours sit at the
    # saddle (0,0): the local QP has zero gradient there.  Assert the
    # iterates stay feasible and the objective does not increase.
    x = S.sym("x", 2)
    nlp = {"x": x, "f": x[0] ** 2 - x[1] ** 2, "g": x[0] ** 2 + x[1] ** 2 - 1.0}
    solver = make_solver(nlp, formulation)
    res = solver.get_optimal_solution(
        arg_of([-100, -100], [100, 100], [-INF], [1.0])
    )
    xv = np.asarray(res["x"])
    # test.cpp passes ubg=1 on g = x^2+y^2-1, i.e. the ball x^2+y^2 <= 2.
    assert xv[0] ** 2 + xv[1] ** 2 <= 2.0 + 1e-2
    assert float(res["f"]) <= 1e-3


def test_callable_nlp_api():
    # Raw-callable problem definition (no Sym), reduced formulation.
    nlp = {
        "x": 2,
        "f": lambda x, p: (x[0] - 1.0) ** 2 + (x[1] + 1.0) ** 2,
        "g": lambda x, p: jnp.atleast_1d(x[0] + x[1]),
    }
    solver = make_solver(nlp, "reduced")
    res = solver.get_optimal_solution(arg_of([-10, -10], [10, 10], [0.0], [0.0]))
    np.testing.assert_allclose(res["x"], [1.0, -1.0], atol=2e-3)


def test_damped_fixed_iteration_parity():
    """Pin the reference's damped-update semantics
    (``SQPOptimizationSolver.cpp:167-177``): with alpha=0.1 and step_num=10
    on a QP, the iterate reaches exactly (1 - 0.9^10) of the optimum —
    the engine must NOT silently converge faster or slower."""
    x = S.sym("x", 2)
    nlp = {"x": x, "f": x[0] ** 2 + x[1] ** 2, "g": x[0] + x[1] - 1.0}
    solver = make_solver(nlp, "augmented", max_iter=10, alpha=0.1)
    res = solver.get_optimal_solution(arg_of([-50, -100], [50, 100], [0.0], [0.0]))
    factor = 1.0 - 0.9 ** 10
    np.testing.assert_allclose(res["x"], [0.5 * factor] * 2, atol=5e-3)


def test_warm_start_across_calls():
    """``result_`` persists across get_optimal_solution calls
    (SQPOptimizationSolver.cpp:88-91, 174-177): a second call continues
    converging from the first call's iterate."""
    x = S.sym("x", 2)
    nlp = {"x": x, "f": x[0] ** 2 + x[1] ** 2, "g": x[0] + x[1] - 1.0}
    solver = make_solver(nlp, "augmented", max_iter=5, alpha=0.3)
    arg = arg_of([-50, -100], [50, 100], [0.0], [0.0])
    res1 = solver.get_optimal_solution(arg)
    err1 = np.abs(np.asarray(res1["x"]) - 0.5).max()
    res2 = solver.get_optimal_solution(arg)
    err2 = np.abs(np.asarray(res2["x"]) - 0.5).max()
    assert err2 < err1  # second call continued from the first
    solver.reset()
    res3 = solver.get_optimal_solution(arg)
    np.testing.assert_allclose(res3["x"], res1["x"], atol=1e-5)


def test_augmented_reduced_equivalence():
    """The reduced formulation (dp eliminated) must match the augmented
    (parity) formulation on a parameterized constrained problem."""
    x = S.sym("x", 3)
    p = S.sym("p", 2)
    f = (x[0] - p[0]) ** 2 + (x[1] - p[1]) ** 2 + 0.5 * x[2] ** 2 + x[0] * x[1]
    g = S.vertcat(x[0] + x[1] + x[2] - 1.0, x[0] - x[2])
    arg = arg_of(
        [-5, -5, -5], [5, 5, 5], [0.0, -1.0], [0.0, 1.0], p=[1.0, -2.0]
    )
    res_aug = SQPOptimizationSolver(
        {"x": x, "f": f, "g": g, "p": p}, SQPOptions(**OPTS, formulation="augmented")
    ).get_optimal_solution(arg)
    res_red = SQPOptimizationSolver(
        {"x": x, "f": f, "g": g, "p": p}, SQPOptions(**OPTS, formulation="reduced")
    ).get_optimal_solution(arg)
    np.testing.assert_allclose(res_aug["x"], res_red["x"], atol=5e-3)


def test_input_validation():
    x = S.sym("x", 2)
    nlp = {"x": x, "f": x[0] ** 2 + x[1] ** 2, "g": x[0] + x[1]}
    solver = make_solver(nlp)
    with pytest.raises(ValueError):
        solver.get_optimal_solution(arg_of([0], [0], [0.0], [0.0]))
    with pytest.raises(ValueError):
        solver.get_optimal_solution(arg_of([0, 0], [0, 0], [], []))


def test_missing_nlp_keys():
    with pytest.raises(ValueError):
        SQPOptimizationSolver({"f": lambda x, p: 0.0})
    with pytest.raises(ValueError):
        SQPOptimizationSolver({"x": 2})


def test_merit_line_search_accelerates_nonlinear():
    """line_search='merit' (opt-in, beyond the reference's fixed alpha)
    makes more progress per SQP iteration on a nonlinear problem and never
    worsens the exact-penalty merit vs a fixed small step."""
    from optimal_control_problem_tpu.models import cartpole

    def build(ls, step_num):
        sqp = {"alpha": 0.1, "step_num": step_num}
        if ls:
            sqp.update({"line_search": "merit", "ls_num": 8,
                        "ls_alpha_max": 1.0})
        cfg = cartpole.make_config(horizon=10, dt=0.04, SQP_settings=sqp,
                                   formulation="reduced")
        return cartpole.build(cfg)

    frame = cartpole.initial_state(th=0.3)
    ref = np.array([np.pi])

    fixed = build(False, 6)
    merit = build(True, 6)
    fixed.compute_optimal_trajectory(frame, ref)
    merit.compute_optimal_trajectory(frame, ref)
    f_fixed = fixed.get_solver_stats()["objective"]
    f_merit = merit.get_solver_stats()["objective"]
    assert np.isfinite(f_merit)
    # 6 iterations of alpha=0.1 leave the iterate far from the optimum;
    # the line search must do strictly better.
    assert f_merit < f_fixed


def test_merit_converges_where_full_fixed_step_diverges():
    """The classic Newton-divergence case f(x) = sqrt(1+(x-2)^2): the
    Newton step is -(x-2)(1+(x-2)^2), so from the zero start (arg["x0"]
    is ignored — the reference quirk) a FULL fixed step (alpha=1)
    overshoots to 10 and then ping-pongs between the box bounds, while
    the merit line search (VERDICT r4 item 7) damps the step and
    converges to the optimum at 2."""
    x = S.sym("x", 1)
    nlp = {"x": x, "f": (1.0 + (x[0] - 2.0) ** 2) ** 0.5}
    arg = arg_of([-100.0], [100.0])

    fixed = make_solver(nlp, "augmented", alpha=1.0, max_iter=12,
                        hessian_reg=0.0)
    res_fixed = fixed.get_optimal_solution(arg)
    merit = make_solver(
        nlp, "augmented", alpha=1.0, max_iter=12, hessian_reg=0.0,
        line_search="merit", ls_num=8, ls_alpha_max=1.0,
    )
    res_merit = merit.get_optimal_solution(arg)

    assert abs(np.asarray(res_fixed["x"])[0] - 2.0) > 50.0  # ping-pong
    assert abs(np.asarray(res_merit["x"])[0] - 2.0) < 1e-2  # converged


def test_line_search_none_bit_identical():
    """line_search='none' must stay BIT-identical to a solver built without
    any line-search fields set (the merit machinery is strictly opt-in and
    may not perturb the reference update path)."""
    x = S.sym("x", 2)
    nlp = {"x": x, "f": (x[0] - 1.0) ** 2 + x[0] * x[1] + x[1] ** 2,
           "g": x[0] + 2.0 * x[1] - 0.5}
    arg = arg_of([-5, -5], [5, 5], [0.0], [0.0])
    base = make_solver(nlp, "augmented", alpha=0.1, max_iter=6)
    explicit = make_solver(
        nlp, "augmented", alpha=0.1, max_iter=6,
        line_search="none", ls_num=4, ls_alpha_max=0.7, ls_merit_mu=3.0,
    )
    rb = base.get_optimal_solution(arg)
    re = explicit.get_optimal_solution(arg)
    np.testing.assert_array_equal(np.asarray(rb["x"]), np.asarray(re["x"]))
    np.testing.assert_array_equal(np.asarray(rb["f"]), np.asarray(re["f"]))


def test_merit_line_search_rejects_unknown_rule():
    from optimal_control_problem_tpu.models import double_integrator as di

    cfg = di.make_config(
        horizon=6, dt=0.01,
        SQP_settings={"alpha": 0.1, "step_num": 2, "line_search": "wolfe"},
    )
    with pytest.raises(ValueError, match="line_search"):
        di.build(cfg)


def test_parity_preset_fields():
    """SQPOptions.parity() pins the exact reference semantics
    (SQPOptimizationSolver.cpp:12-17, 50-58, 174-177): augmented z, raw
    objective Hessian, fixed damped step alpha=0.1 x 10, no line search,
    no shared-system shortcut."""
    opt = SQPOptions.parity()
    assert opt.formulation == "augmented"
    assert opt.hessian_reg == 0.0
    assert opt.line_search == "none"
    assert opt.alpha == 0.1
    assert opt.max_iter == 10
    assert opt.shared_system is False
    # Overrides pass through.
    opt2 = SQPOptions.parity(verbose=True, max_iter=4)
    assert opt2.verbose and opt2.max_iter == 4 and opt2.hessian_reg == 0.0


def test_parity_preset_damped_trajectory():
    """End-to-end with the parity preset: the damped fixed-iteration factor
    1 - 0.9^10 is hit exactly (the strongest single-case trajectory pin
    available without CasADi/OSQP in this image)."""
    x = S.sym("x", 2)
    nlp = {"x": x, "f": x[0] ** 2 + x[1] ** 2, "g": x[0] + x[1] - 1.0}
    solver = SQPOptimizationSolver(
        nlp,
        SQPOptions.parity(admm=ADMMSettings(eps_abs=1e-5, eps_rel=1e-5)),
    )
    res = solver.get_optimal_solution(
        arg_of([-50, -100], [50, 100], [0.0], [0.0])
    )
    factor = 1.0 - 0.9 ** 10
    np.testing.assert_allclose(res["x"], [0.5 * factor] * 2, atol=5e-4)


def test_early_exit_verbose_tie(capsys):
    """The ||alpha*dx|| < 1e-6 break is checked only when verbose
    (SQPOptimizationSolver.cpp:189-196): verbose=True stops early on a QP
    solved exactly in one full step; verbose=False runs all iterations."""
    x = S.sym("x", 2)
    nlp = {"x": x, "f": (x[0] - 1.0) ** 2 + (x[1] + 2.0) ** 2}
    kw = dict(max_iter=8, alpha=1.0,
              admm=ADMMSettings(eps_abs=1e-6, eps_rel=1e-6))
    quiet = SQPOptimizationSolver(nlp, SQPOptions(**kw))
    res_q = quiet.get_optimal_solution(arg_of([-50, -50], [50, 50]))
    assert int(quiet.last_result.steps_taken) == 8

    loud = SQPOptimizationSolver(nlp, SQPOptions(verbose=True, **kw))
    res_l = loud.get_optimal_solution(arg_of([-50, -50], [50, 50]))
    taken = int(loud.last_result.steps_taken)
    assert taken < 8  # converged in a couple of full steps -> early break
    # Frozen iterations change nothing: same answer as the full run.
    np.testing.assert_allclose(res_l["x"], res_q["x"], atol=1e-5)
    np.testing.assert_allclose(res_l["x"], [1.0, -2.0], atol=1e-3)
    out = capsys.readouterr().out
    assert "early exit" in out
    # qp_iters report 0 for frozen steps.
    qp_iters = np.asarray(loud.last_result.qp_iters)
    assert np.all(qp_iters[taken + 1:] == 0)


def test_early_exit_explicit_override():
    """early_exit=True forces the break even when quiet; early_exit=False
    disables it even when verbose."""
    x = S.sym("x", 2)
    nlp = {"x": x, "f": (x[0] - 1.0) ** 2 + (x[1] + 2.0) ** 2}
    kw = dict(max_iter=8, alpha=1.0,
              admm=ADMMSettings(eps_abs=1e-6, eps_rel=1e-6))
    forced = SQPOptimizationSolver(nlp, SQPOptions(early_exit=True, **kw))
    forced.get_optimal_solution(arg_of([-50, -50], [50, 50]))
    assert int(forced.last_result.steps_taken) < 8

    off = SQPOptimizationSolver(
        nlp, SQPOptions(verbose=True, early_exit=False, **kw)
    )
    off.get_optimal_solution(arg_of([-50, -50], [50, 50]))
    assert int(off.last_result.steps_taken) == 8
