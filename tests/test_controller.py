"""Closed-loop MPCController tests."""

import numpy as np
import pytest

from optimal_control_problem_tpu.controller import MPCController
from optimal_control_problem_tpu.models import double_integrator as di


def rollout(shift):
    H, dt = 10, 0.05
    ocp = di.build(di.make_config(horizon=H, dt=dt, alpha=0.7, step_num=8))
    ctl = MPCController(ocp, di.CONTROL_SLICE, shift_warm_start=shift)
    target = np.array([1.0, 0.5])
    ref = np.tile(target, H)
    pos, vel, acc = np.zeros(2), np.zeros(2), np.zeros(2)
    errs = []
    for _ in range(40):
        u = ctl.step(np.concatenate([pos, vel, acc]), ref)
        pos = pos + dt * vel
        vel = vel + dt * u
        acc = u
        errs.append(np.linalg.norm(pos - target))
    return np.array(errs)


def test_controller_closes_loop_with_shift():
    errs = rollout(shift=True)
    assert errs[-1] < 0.4 * errs[0]


def test_controller_reference_style_warm_start():
    errs = rollout(shift=False)
    assert errs[-1] < 0.5 * errs[0]


def test_control_slices_exported():
    from optimal_control_problem_tpu.models import cartpole, quadrotor, unicycle

    assert di.CONTROL_SLICE == slice(4, 6)
    assert cartpole.CONTROL_SLICE == slice(4, 5)
    assert unicycle.CONTROL_SLICE == slice(3, 5)
    assert quadrotor.CONTROL_SLICE == slice(12, 16)


def test_plan_property_and_requires_gen():
    ocp = di.DoubleIntegratorOCP(di.make_config(horizon=6, dt=0.05))
    ocp.gen_solver()
    ctl = MPCController(ocp, di.CONTROL_SLICE)
    assert ctl.plan is None
    u = ctl.step(di.initial_state(), np.zeros(12))
    assert u.shape == (2,)
    assert ctl.plan.shape == (6, di.FRAME)


def test_controller_nonlinear_cartpole():
    """Controller drives the nonlinear cart-pole toward upright."""
    from optimal_control_problem_tpu.models import cartpole

    H, dt = 12, 0.04
    cfg = cartpole.make_config(
        horizon=H, dt=dt, alpha=0.3, step_num=8,
        formulation="reduced",
        ADMM_settings={"method": "condensed", "max_iter": 500},
    )
    ocp = cartpole.build(cfg)
    ctl = MPCController(ocp, cartpole.CONTROL_SLICE)
    state = cartpole.initial_state(th=2.6)  # near upright (pi ~ 3.14)
    ref = np.array([np.pi])

    def plant(s, F, dt):
        x, dx, th, dth, _ = s
        import jax.numpy as jnp

        ddx, ddth = cartpole.cartpole_accel(
            jnp.asarray(dx), jnp.asarray(th), jnp.asarray(dth), jnp.asarray(F)
        )
        return np.array(
            [x + dt * dx, dx + dt * float(ddx), th + dt * dth,
             dth + dt * float(ddth), F],
        )

    err0 = abs(state[2] - np.pi)
    for _ in range(50):
        u = ctl.step(state, ref)
        state = plant(state, float(u[0]), dt)
    err_end = abs(state[2] - np.pi)
    assert err_end < err0
    assert err_end < 0.25
