"""Full fixed-iteration SQP parity oracle — f64 derivatives + native f32 QP.

The BASELINE target requires control sequences matching the reference within
1e-4 at identical horizon/SQP/ADMM settings.  CasADi/OSQP cannot be installed
in this image (no pip route), so a direct run of the reference is impossible;
this module is the strongest available stand-in: the reference's COMPLETE
per-tick loop (``/root/reference/src/sqp_solver/SQPOptimizationSolver.cpp:
127-216``) re-implemented on the host with

* **f64 derivative evaluation** — JAX tracing on CPU with x64 enabled plays
  the role of CasADi's double-precision symbolic ``localSystemFunction_``
  (``SQPOptimizationSolver.cpp:74-77,100-120``);
* **f32 QP solves through the independent C++ ADMM oracle**
  (``csrc/ref_admm.cpp`` via :mod:`.native`) playing the role of OSQP built
  with ``OSQP_USE_FLOAT=ON`` (``cuda_install.sh:44``), cold-started every
  SQP iteration exactly like the reference's full ``initSolver()`` re-init
  (``CuCaQP.cpp:183-197``: ``clearSolver`` + fresh workspace, so the OSQP
  ``warm_start`` setting never carries state between iterations);
* the reference's loop semantics verbatim: augmented z=[p;x], objective-only
  Hessian (no regularization), ``l - c(z)`` bound shifts, ``x += alpha*dx``
  for exactly ``step_num`` iterations (non-verbose mode never early-exits,
  cpp:189-196), persistent ``result_`` across MPC ticks starting from zeros
  (cpp:88-91 — the incoming ``x0`` is ignored by this backend);
* the MPC tick assembly of ``computeOptimalTrajectory``
  (``OptimalControlProblem.cpp:78-222``): first-frame pinning via
  ``lbx = ubx = frame`` (cpp:95-96) and per-tick constraint bounds.

Tests (``tests/test_parity_oracle.py``) run this oracle in a subprocess with
``JAX_ENABLE_X64=1`` and assert <= 1e-4 control-sequence agreement with the
TPU path at reference settings on all four models over a multi-tick loop.

Run standalone::

    python -m optimal_control_problem_tpu.solvers.oracle \
        --model cartpole --ticks 3 --out /tmp/oracle.npz
"""

from __future__ import annotations

import argparse
from typing import Any, Dict, Optional

import numpy as np

__all__ = [
    "ORACLE_MODELS",
    "scripted_scenario",
    "build_parity_ocp",
    "oracle_closed_loop",
    "REFERENCE_QP_SETTINGS",
]

# Reference inner-QP constants (SQPOptimizationSolver.cpp:80-85 + the OSQP
# defaults OSQP-Eigen leaves untouched): abs/rel tol 1e-3, max 10000 ADMM
# iterations, rho 0.1, sigma 1e-6, relaxation 1.6, termination check every
# 25 iterations, 10 Ruiz passes.  The C++ oracle has NO adaptive rho (OSQP's
# default adaptive_rho is time-based and non-deterministic — a semantics the
# fixed-iteration parity comparison must avoid), so the TPU side of the
# comparison runs with adaptive_rho=False as well.
REFERENCE_QP_SETTINGS: Dict[str, Any] = dict(
    rho=0.1,
    sigma=1e-6,
    alpha=1.6,
    eps_abs=1e-3,
    eps_rel=1e-3,
    max_iter=10000,
    check_every=25,
    scaling_iters=10,
)

# Per-model oracle scenarios: modest horizons keep the dense C++ QP oracle
# (O(n^2) per ADMM iteration, scalar loops) tractable while exercising every
# model's nonlinearity.  alpha/step_num are the reference defaults
# (readme.md:60-61).
ORACLE_MODELS = ("double_integrator", "cartpole", "unicycle", "quadrotor")


def _model_spec(model: str, horizon: Optional[int] = None):
    """(module, build_kwargs, horizon, dt) for one oracle scenario."""
    from ..models import cartpole, double_integrator, quadrotor, unicycle

    if model == "double_integrator":
        return double_integrator, {}, horizon or 20, 0.005
    if model == "cartpole":
        return cartpole, {}, horizon or 20, 0.02
    if model == "unicycle":
        return unicycle, {"halfspaces": (((0.0, 1.0), -0.5),)}, horizon or 20, 0.05
    if model == "quadrotor":
        return quadrotor, {}, horizon or 10, 0.02
    raise ValueError(f"unknown oracle model {model!r}")


def scripted_scenario(model: str, ticks: int, horizon: Optional[int] = None):
    """Deterministic (frames (ticks, fs), reference (n_p,)) shared by the
    oracle and the TPU side of the comparison.

    The measured-state sequence is scripted (initial state plus small
    deterministic sinusoidal excursions) rather than closed over either
    solver's own predictions, so both implementations see IDENTICAL inputs —
    the comparison isolates solver-trajectory parity from plant divergence.
    """
    mod, build_kw, H, dt = _model_spec(model, horizon)
    fs = mod.FRAME
    frames = np.zeros((ticks, fs), np.float64)
    t = np.arange(ticks, dtype=np.float64)[:, None]
    j = np.arange(fs, dtype=np.float64)[None, :]

    if model == "double_integrator":
        base = mod.initial_state()
        ref = mod.reference_circle(H, dt)
        amp = 0.3
    elif model == "cartpole":
        base = mod.initial_state(th=0.3)
        ref = np.full((1,), np.pi)
        amp = 0.1
    elif model == "unicycle":
        base = mod.initial_state(th=0.2)
        ref = mod.reference_line(H, dt)
        amp = 0.2
    else:  # quadrotor
        base = mod.initial_state()
        ref = mod.reference_hover(H)
        amp = 0.1
    frames[:] = base[None, :] + amp * np.sin(
        0.7 * t + 0.9 * j
    ) * np.cos(0.3 + 0.5 * j)
    # Keep the scripted states inside the frame box bounds so first-frame
    # pinning (lbx = ubx = frame) never produces an infeasible pin.
    ocp_probe = build_parity_ocp(model, horizon, gen=False)
    lb = ocp_probe.ocp_config.lower_bounds_flat()[:fs]
    ub = ocp_probe.ocp_config.upper_bounds_flat()[:fs]
    frames = np.clip(frames, lb + 1e-3, ub - 1e-3)
    return frames, np.asarray(ref, np.float64)


def build_parity_ocp(
    model: str,
    horizon: Optional[int] = None,
    gen: bool = True,
    precision: str = "f32",
):
    """The model OCP at exact reference settings (parity preset, fixed-rho
    reference QP constants, registry [non-stagewise] NLP construction).

    ``precision="f64"`` runs the SAME product solve path in double (only
    meaningful in an x64-enabled process) — used by the semantic-parity
    comparison against the f64 oracle, which removes the f32 drift floor.
    """
    mod, build_kw, H, dt = _model_spec(model, horizon)
    config = mod.make_config(
        horizon=H,
        dt=dt,
        alpha=0.1,
        step_num=10,
        SQP_settings={
            "alpha": 0.1,
            "step_num": 10,
            "parity": True,
        },
        precision=precision,
        ADMM_settings=dict(REFERENCE_QP_SETTINGS, adaptive_rho=False,
                           method="condensed"),
    )
    if gen:
        return mod.build(config, **build_kw)
    # Construction without solver generation (the oracle side only needs the
    # traced NLP functions and bounds): instantiate the model's OCP subclass
    # directly, skipping build()'s gen_solver().
    for attr in dir(mod):
        obj = getattr(mod, attr)
        if isinstance(obj, type) and attr.endswith("OCP"):
            return obj(config, **build_kw)
    raise RuntimeError(f"no OCP subclass found in {mod.__name__}")


def oracle_closed_loop(
    model: str,
    ticks: int = 3,
    horizon: Optional[int] = None,
    step_num: int = 10,
    alpha: float = 0.1,
    qp_internal_f64: bool = False,
) -> Dict[str, np.ndarray]:
    """Run the reference-loop oracle over the scripted scenario.

    ``qp_internal_f64=False`` (default) solves each QP with f32 internals —
    the faithful OSQP_USE_FLOAT=ON analog; ``True`` iterates the SAME C++
    code in double, giving the precision-floor-free reference trajectory
    for the semantic-parity comparison.

    Returns ``{"trajectories": (ticks, n_x) f64, "frames", "reference"}``.
    Must run in a process with ``jax_enable_x64`` ON (the CLI entry sets it);
    raises otherwise — silently computing the "f64 CasADi stand-in" in f32
    would invalidate the parity evidence.
    """
    import jax

    if not jax.config.jax_enable_x64:
        raise RuntimeError(
            "oracle_closed_loop requires jax_enable_x64 (run via the CLI "
            "entry or set JAX_ENABLE_X64=1)"
        )
    import jax.numpy as jnp

    from .native import native_admm_solve
    from .sqp import build_local_system_fn, normalize_nlp

    ocp = build_parity_ocp(model, horizon, gen=False)
    f_fn, g_fn = ocp._build_nlp_fns()
    nlp = {
        "x": ocp.ocp_config.get_variables(),
        "f": f_fn,
        "g": g_fn,
        "p": ocp.reference_size,
    }
    f_n, g_n, n_x, n_p, n_g = normalize_nlp(nlp)
    # The reference's localSystemFunction_: augmented z, objective-only
    # Hessian, NO regularization, f64 end to end.
    local_system = jax.jit(
        build_local_system_fn(
            f_n, g_n, n_x, n_p, n_g, "augmented", jnp.float64, hessian_reg=0.0
        )
    )

    frames, reference = scripted_scenario(model, ticks, horizon)
    cfg = ocp.ocp_config
    fs = cfg.get_frame_size()
    lbx0 = cfg.lower_bounds_flat()
    ubx0 = cfg.upper_bounds_flat()
    lbg = ocp.get_constraint_lower_bounds()
    ubg = ocp.get_constraint_upper_bounds()

    # result_ persists across ticks, zeros at start (cpp:88-91); the per-tick
    # x0 warm-start argument is IGNORED by the CUDA_SQP backend.
    x = np.zeros(n_x, np.float64)
    trajs = np.zeros((ticks, n_x), np.float64)
    for t in range(ticks):
        lbx = lbx0.copy()
        ubx = ubx0.copy()
        lbx[:fs] = frames[t]  # first-frame pinning (cpp:95-96)
        ubx[:fs] = frames[t]
        for _ in range(step_num):
            H, grad, A, l_lin, u_lin = local_system(
                jnp.asarray(x), jnp.asarray(reference),
                jnp.asarray(lbx), jnp.asarray(ubx),
                jnp.asarray(lbg), jnp.asarray(ubg),
            )
            sol = native_admm_solve(  # f32 QP, cold start (initSolver re-init)
                np.asarray(H), np.asarray(grad), np.asarray(A),
                np.asarray(l_lin), np.asarray(u_lin),
                internal_f64=qp_internal_f64,
                **REFERENCE_QP_SETTINGS,
            )
            dx = sol.x[n_p:].astype(np.float64)
            x = x + alpha * dx  # damped fixed step (cpp:174-177)
        trajs[t] = x
    return {
        "trajectories": trajs,
        "frames": frames,
        "reference": reference,
    }


def product_closed_loop(
    model: str,
    ticks: int = 3,
    horizon: Optional[int] = None,
    precision: str = "f32",
) -> np.ndarray:
    """Run the PRODUCT solve path (OptimalControlProblem -> jitted
    SQPOptimizationSolver, parity preset) over the scripted scenario and
    return per-tick trajectories (ticks, n_x).

    ``precision="f64"`` needs an x64-enabled process and gives the
    drift-floor-free trajectory for the semantic-parity assertion.
    """
    ocp = build_parity_ocp(model, horizon, precision=precision)
    frames, reference = scripted_scenario(model, ticks, horizon)
    trajs = []
    for t in range(ticks):
        ocp.compute_optimal_trajectory(frames[t], reference)
        trajs.append(np.asarray(ocp.get_optimal_trajectory(), np.float64))
    return np.stack(trajs)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model", choices=ORACLE_MODELS, required=True)
    parser.add_argument("--ticks", type=int, default=3)
    parser.add_argument("--horizon", type=int, default=None)
    parser.add_argument("--out", required=True)
    args = parser.parse_args(argv)

    # Force the CPU backend: the session image pre-registers an accelerator
    # backend at interpreter startup (sitecustomize), so the env var alone is
    # not enough — clear the initialized backends and re-resolve, exactly
    # like tests/conftest.py.  The oracle is a host-side f64 program; TPU
    # lacks f64 LU/solve kernels.
    import os

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        from jax.extend import backend as _jax_backend

        _jax_backend.clear_backends()
    except Exception:  # pragma: no cover - env var may suffice
        pass
    jax.config.update("jax_enable_x64", True)
    out = oracle_closed_loop(args.model, args.ticks, args.horizon)
    # Same loop with the C++ QP iterating in double: the precision-floor-
    # free oracle trajectory.
    out["trajectories_f64qp"] = oracle_closed_loop(
        args.model, args.ticks, args.horizon, qp_internal_f64=True
    )["trajectories"]
    # The PRODUCT path (jitted SQP scan + JAX ADMM) in f64: agreement with
    # trajectories_f64qp proves loop-semantics parity without the f32
    # drift floor.
    out["trajectories_product_f64"] = product_closed_loop(
        args.model, args.ticks, args.horizon, precision="f64"
    )
    np.savez(args.out, **out)
    print(f"oracle[{args.model}] wrote {args.out}")


if __name__ == "__main__":
    main()
