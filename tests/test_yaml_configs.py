"""The shipped YAML config files must load and build end to end."""

from pathlib import Path

import numpy as np

from optimal_control_problem_tpu.models import cartpole
from optimal_control_problem_tpu.models.double_integrator import DoubleIntegratorOCP

CONFIGS = Path(__file__).resolve().parents[1] / "configs"


def test_double_integrator_yaml():
    ocp = DoubleIntegratorOCP(str(CONFIGS / "double_integrator.yaml"))
    assert ocp.ocp_config.get_horizon() == 20
    assert ocp.ocp_config.get_dt() == 0.005
    assert ocp.solver_settings.alpha == 0.1
    assert ocp.solver_settings.step_num == 10
    ocp.gen_solver()
    assert ocp.solver is not None


def test_cartpole_yaml():
    ocp = cartpole.CartPoleOCP(str(CONFIGS / "cartpole.yaml"))
    assert ocp.ocp_config.get_frame_size() == 5
    lb = ocp.ocp_config.lower_bounds_flat()
    assert lb[0] == -2.0 and np.isneginf(lb[1])


def test_unicycle_yaml():
    from optimal_control_problem_tpu.models import unicycle

    ocp = unicycle.UnicycleOCP(str(CONFIGS / "unicycle.yaml"))
    assert ocp.ocp_config.get_horizon() == 50
    assert ocp.ocp_config.get_frame_size() == 5
    ub = ocp.ocp_config.upper_bounds_flat()
    assert ub[3] == 2.0 and ub[4] == 3.0


def test_quadrotor_yaml():
    from optimal_control_problem_tpu.models import quadrotor

    ocp = quadrotor.QuadrotorOCP(str(CONFIGS / "quadrotor.yaml"))
    assert ocp.ocp_config.get_horizon() == 100
    assert ocp.ocp_config.get_frame_size() == 16
    assert ocp.solver_settings.step_num == 5
    lb = ocp.ocp_config.lower_bounds_flat()
    assert lb[12] == 0.0  # thrust lower bound
