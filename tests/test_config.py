"""Tests for OCPConfig / Frame (parity with reference OCPConfig.cpp)."""

import numpy as np
import pytest

from optimal_control_problem_tpu import OCPConfig
from optimal_control_problem_tpu.config import Frame, load_config
from optimal_control_problem_tpu.sym import evaluate
import jax.numpy as jnp

YAML_DOC = """
optimal_control_problem:
  discretization_settings:
    dt: 0.005
    horizon: 20
  solver_settings:
    verbose: false
    gen_code: false
    recompile: false
    load_lib: false
    solve_method: CUDA_SQP
    max_iter: 1000
    warm_start: true
    SQP_settings:
      alpha: 0.1
      step_num: 10
  OCP_variables:
    - name: "q"
      size: 2
      lower_bound: [-1.0, -2.0]
      upper_bound: [1.0, 2.0]
    - name: "dq"
      size: 2
      lower_bound: ["-.inf", "-.inf"]
      upper_bound: [".inf", ".inf"]
    - name: "u"
      size: 1
      lower_bound: [-5.0]
      upper_bound: [5.0]
"""


def make_config():
    return OCPConfig(YAML_DOC)


def test_frame_layout():
    cfg = make_config()
    assert cfg.get_horizon() == 20
    assert cfg.get_dt() == 0.005
    assert cfg.get_frame_size() == 5
    assert cfg.frame.field_offsets == {"q": 0, "dq": 2, "u": 4}
    assert cfg.num_variables == 100


def test_get_variable_slicing():
    cfg = make_config()
    X = jnp.arange(100.0)
    q3 = cfg.get_variable(3, "q")
    np.testing.assert_allclose(evaluate(q3, {"X": X}), [15.0, 16.0])
    u0 = cfg.get_variable(0, "u")
    np.testing.assert_allclose(evaluate(u0, {"X": X}), [4.0])
    fr = cfg.get_frame(19)
    np.testing.assert_allclose(evaluate(fr, {"X": X}), np.arange(95.0, 100.0))


def test_get_variable_errors():
    cfg = make_config()
    with pytest.raises(IndexError):
        cfg.get_variable(20, "q")
    with pytest.raises(KeyError):
        cfg.get_variable(0, "nope")


def test_bounds_replicated_and_inf_parsed():
    cfg = make_config()
    lb = cfg.lower_bounds_flat()
    ub = cfg.upper_bounds_flat()
    assert lb.shape == (100,)
    one_lb = np.array([-1.0, -2.0, -np.inf, -np.inf, -5.0])
    one_ub = np.array([1.0, 2.0, np.inf, np.inf, 5.0])
    np.testing.assert_allclose(lb, np.tile(one_lb, 20))
    np.testing.assert_allclose(ub, np.tile(one_ub, 20))
    assert len(cfg.get_lower_bounds()) == 20


def test_initial_guess_validation():
    cfg = make_config()
    with pytest.raises(ValueError):
        cfg.set_initial_guess(np.zeros(7))
    cfg.set_initial_guess(np.ones(100))
    np.testing.assert_allclose(cfg.get_initial_guess(), np.ones(100))


def test_missing_nodes_raise():
    with pytest.raises(ValueError):
        OCPConfig({"discretization_settings": {"dt": 0.1, "horizon": 5}})
    with pytest.raises(Exception):
        OCPConfig({"OCP_variables": []})


def test_duplicate_field_rejected():
    with pytest.raises(ValueError):
        Frame.from_config([{"name": "q", "size": 2}, {"name": "q", "size": 1}])


def test_zero_size_field_rejected():
    with pytest.raises(ValueError):
        Frame.from_config([{"name": "q", "size": 0}])


def test_load_config_unwraps_top_key():
    node = load_config(YAML_DOC)
    assert "OCP_variables" in node


def test_yaml_native_inf():
    # PyYAML parses bare .inf as float inf; both forms must work.
    doc = {
        "discretization_settings": {"dt": 0.1, "horizon": 2},
        "OCP_variables": [
            {
                "name": "x",
                "size": 1,
                "lower_bound": [float("-inf")],
                "upper_bound": [float("inf")],
            }
        ],
    }
    cfg = OCPConfig(doc)
    assert np.isneginf(cfg.lower_bounds_flat()[0])
    assert np.isposinf(cfg.upper_bounds_flat()[0])
