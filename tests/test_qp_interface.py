"""Tests for the imperative CuCaQP-compatible QP interface."""

import numpy as np
import pytest

from optimal_control_problem_tpu.solvers.qp_interface import CuCaQP, TpuQP


def test_full_workflow_snake_case():
    qp = TpuQP()
    assert qp.set_dimension(2, 1)
    assert qp.set_hessian_matrix(2 * np.eye(2))
    assert qp.set_gradient(np.zeros(2))
    assert qp.set_linear_constraints_matrix(np.array([[1.0, 1.0]]))
    assert qp.set_lower_bound([1.0])
    assert qp.set_upper_bound([1.0])
    qp.set_absolute_tolerance(1e-4)
    qp.set_relative_tolerance(1e-4)
    assert qp.init_solver()
    assert qp.solve()
    np.testing.assert_allclose(qp.get_solution(), [0.5, 0.5], atol=1e-3)


def test_reference_camel_case_api():
    # The exact call sequence from SQP_readme.md's usage example.
    qp = CuCaQP()
    assert qp.setDimension(3, 2)
    P = np.diag([2.0, 2.0, 2.0])
    q = np.array([-1.0, -2.0, 0.0])
    A = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 1.0]])
    assert qp.setHessianMatrix(P)
    assert qp.setGradient(q)
    assert qp.setLinearConstraintsMatrix(A)
    assert qp.setLowerBound(np.array([0.0, 0.0]))
    assert qp.setUpperBound(np.array([10.0, 10.0]))
    qp.setVerbosity(False)
    qp.setWarmStart(True)
    qp.setAbsoluteTolerance(1e-4)
    qp.setRelativeTolerance(1e-4)
    qp.setMaxIteration(10000)
    assert qp.initSolver()
    assert qp.solve()
    x = qp.getSolutionAsDM()
    # Unconstrained optimum (0.5, 1, 0) satisfies the bounds.
    np.testing.assert_allclose(x, [0.5, 1.0, 0.0], atol=2e-3)


def test_dimension_mismatch_returns_false():
    qp = TpuQP()
    qp.set_dimension(2, 1)
    assert not qp.set_hessian_matrix(np.eye(3))  # CuCaQP.cpp:48-59 semantics
    assert not qp.set_gradient(np.zeros(3))
    assert not qp.set_linear_constraints_matrix(np.zeros((2, 2)))
    assert not qp.set_lower_bound(np.zeros(2))


def test_setters_before_dimension_fail():
    qp = TpuQP()
    assert not qp.set_hessian_matrix(np.eye(2))
    assert not qp.init_solver()
    assert not qp.solve()


def test_update_and_resolve_with_warm_start():
    qp = TpuQP()
    qp.set_dimension(2, 2)
    qp.set_system(
        (
            2 * np.eye(2),
            np.array([-2.0, -4.0]),
            np.eye(2),
            np.zeros(2),
            10 * np.ones(2),
        )
    )
    qp.set_absolute_tolerance(1e-4)
    qp.set_relative_tolerance(1e-4)
    assert qp.solve()
    np.testing.assert_allclose(qp.get_solution(), [1.0, 2.0], atol=1e-3)
    # update* path: shift the optimum, warm-started re-solve.
    assert qp.update_gradient(np.array([-4.0, -2.0]))
    assert qp.solve()
    np.testing.assert_allclose(qp.get_solution(), [2.0, 1.0], atol=1e-3)


def test_get_solution_before_solve_raises():
    qp = TpuQP()
    with pytest.raises(RuntimeError):
        qp.get_solution()
