"""Tests for the Sym expression layer (CasADi-SX analog)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optimal_control_problem_tpu import sym as S


def test_leaf_and_eval():
    x = S.sym("x", 3)
    v = S.evaluate(x, {"x": jnp.array([1.0, 2.0, 3.0])})
    np.testing.assert_allclose(v, [1.0, 2.0, 3.0])


def test_arithmetic_and_slicing():
    x = S.sym("x", 4)
    expr = 2.0 * x[0:2] + x[2:4] - 1.0
    v = S.evaluate(expr, {"x": jnp.array([1.0, 2.0, 3.0, 4.0])})
    np.testing.assert_allclose(v, [2 + 3 - 1, 4 + 4 - 1])


def test_scalar_index():
    x = S.sym("x", 3)
    expr = x[0] * x[1] + x[2] ** 2
    v = S.evaluate(expr, {"x": jnp.array([2.0, 3.0, 4.0])})
    np.testing.assert_allclose(v, [2 * 3 + 16])


def test_vertcat_and_functions():
    x = S.sym("x", 2)
    expr = S.vertcat(S.sin(x[0]), S.cos(x[1]), x[0] + x[1])
    v = S.evaluate(expr, {"x": jnp.array([0.5, 1.5])})
    np.testing.assert_allclose(
        v, [np.sin(0.5), np.cos(1.5), 2.0], rtol=1e-6
    )


def test_sumsqr_dot():
    x = S.sym("x", 3)
    v = S.evaluate(S.sumsqr(x), {"x": jnp.array([1.0, 2.0, 3.0])})
    np.testing.assert_allclose(v, [14.0])
    v = S.evaluate(S.dot(x, [1.0, 0.0, 2.0]), {"x": jnp.array([1.0, 2.0, 3.0])})
    np.testing.assert_allclose(v, [7.0])


def test_compile_fn_and_autodiff():
    x = S.sym("x", 2)
    p = S.sym("p", 1)
    expr = (x[0] - p[0]) ** 2 + x[1] ** 2
    fn = S.compile_fn(expr, [x, p])
    val = fn(jnp.array([3.0, 1.0]), jnp.array([1.0]))
    np.testing.assert_allclose(val, [5.0])
    # The compiled function is a pure jnp function: differentiable.
    g = jax.grad(lambda xx: fn(xx, jnp.array([1.0]))[0])(jnp.array([3.0, 1.0]))
    np.testing.assert_allclose(g, [4.0, 2.0])


def test_shared_subexpression_memoization():
    x = S.sym("x", 1)
    calls = []

    def noisy(env, memo):
        calls.append(1)
        return env["x"] * 2

    shared = S.Sym(noisy, (1,), ())
    expr = shared + shared * 3.0
    S.evaluate(expr, {"x": jnp.array([1.0])})
    assert len(calls) == 1  # evaluated once despite two uses


def test_shape_errors():
    x = S.sym("x", 3)
    y = S.sym("y", 2)
    with pytest.raises(ValueError):
        _ = x + y
    with pytest.raises(IndexError):
        _ = x[5]


def test_binding_size_check():
    x = S.sym("x", 3)
    with pytest.raises(ValueError):
        S.evaluate(x, {"x": jnp.array([1.0, 2.0])})


def test_extended_functions():
    x = S.sym("x", 2)
    env = {"x": jnp.array([0.5, -0.5])}
    np.testing.assert_allclose(
        S.evaluate(S.atan2(x[0], x[1]), env), [np.arctan2(0.5, -0.5)], rtol=1e-6
    )
    np.testing.assert_allclose(
        S.evaluate(S.minimum(x, 0.0), env), [0.0, -0.5]
    )
    np.testing.assert_allclose(
        S.evaluate(S.maximum(x, 0.0), env), [0.5, 0.0]
    )
    np.testing.assert_allclose(
        S.evaluate(S.norm_2(x), env), [np.sqrt(0.5)], rtol=1e-6
    )
    np.testing.assert_allclose(
        S.evaluate(S.asin(x[0]) + S.acos(x[0]) + S.atan(x[1]), env),
        [np.arcsin(0.5) + np.arccos(0.5) + np.arctan(-0.5)],
        rtol=1e-6,
    )
