"""Stage-structured derivatives vs the generic dense path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optimal_control_problem_tpu.models import cartpole
from optimal_control_problem_tpu.stagewise import (
    build_stagewise_fns,
    build_stagewise_parts,
)


H, DT = 8, 0.04


@pytest.fixture(scope="module")
def pair():
    cfg = cartpole.make_config(
        horizon=H,
        dt=DT,
        alpha=0.3,
        step_num=6,
        formulation="reduced",
        ADMM_settings={"method": "condensed", "max_iter": 1000},
    )
    generic = cartpole.build(dict(cfg))
    staged = cartpole.build(dict(cfg), stagewise=True)
    return generic, staged


def test_fns_agree(pair):
    generic, staged = pair
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(H * cartpole.FRAME,)), jnp.float32)
    P = jnp.asarray([np.pi], jnp.float32)
    fg, gg = generic.nlp_functions
    fs, gs = staged.nlp_functions
    np.testing.assert_allclose(float(fg(X, P)), float(fs(X, P)), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(gg(X, P)), np.asarray(gs(X, P)), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        generic.get_constraint_lower_bounds(), staged.get_constraint_lower_bounds()
    )
    assert generic.num_constraints == staged.num_constraints


def test_local_system_agrees(pair):
    generic, staged = pair
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(H * cartpole.FRAME,)) * 0.3, jnp.float32)
    p = jnp.asarray([np.pi], jnp.float32)
    gm_raw = generic.solver._parts[1]
    sm_raw = staged.solver._parts[1]
    Hg, Ag = jax.jit(gm_raw)(x, p)
    Hs, As = jax.jit(sm_raw)(x, p)
    np.testing.assert_allclose(np.asarray(Hs), np.asarray(Hg), atol=1e-4)
    np.testing.assert_allclose(np.asarray(As), np.asarray(Ag), atol=1e-4)
    gv = generic.solver._parts[2]
    sv = staged.solver._parts[2]
    grad_g, c_g = jax.jit(gv)(x, p)
    grad_s, c_s = jax.jit(sv)(x, p)
    np.testing.assert_allclose(np.asarray(grad_s), np.asarray(grad_g), atol=1e-4)
    np.testing.assert_allclose(np.asarray(c_s), np.asarray(c_g), atol=1e-5)


def test_solve_agrees(pair):
    generic, staged = pair
    frame = cartpole.initial_state(th=0.4)
    ref = np.array([np.pi])
    for _ in range(2):
        generic.compute_optimal_trajectory(frame, ref)
        staged.compute_optimal_trajectory(frame, ref)
    tg = np.asarray(generic.get_optimal_trajectory())
    ts = np.asarray(staged.get_optimal_trajectory())
    # Same algorithm, same semantics; differences only from regularization
    # details and QP tolerance.
    np.testing.assert_allclose(ts, tg, atol=5e-2)
    # Both respect the rate inequality.
    assert np.abs(ts.reshape(H, cartpole.FRAME)[:, 3]).max() <= 12.0 + 1e-2


def test_quadrotor_stagewise_matches_generic():
    from optimal_control_problem_tpu.models import quadrotor

    Hq = 6
    cfg = quadrotor.make_config(
        horizon=Hq, dt=0.02, alpha=0.4, step_num=4, formulation="reduced",
        ADMM_settings={"method": "condensed", "max_iter": 500},
    )
    generic = quadrotor.build(dict(cfg))
    staged = quadrotor.build(dict(cfg), stagewise=True)
    rng = np.random.default_rng(2)
    X = jnp.asarray(rng.normal(size=(Hq * quadrotor.FRAME,)) * 0.2, jnp.float32)
    P = jnp.asarray(quadrotor.reference_hover(Hq), jnp.float32)
    fg, gg = generic.nlp_functions
    fs, gs = staged.nlp_functions
    np.testing.assert_allclose(float(fg(X, P)), float(fs(X, P)), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(gg(X, P)), np.asarray(gs(X, P)), rtol=1e-4, atol=1e-5
    )
    Hg, Ag = jax.jit(generic.solver._parts[1])(X, P)
    Hs, As = jax.jit(staged.solver._parts[1])(X, P)
    np.testing.assert_allclose(np.asarray(Hs), np.asarray(Hg), atol=1e-4)
    np.testing.assert_allclose(np.asarray(As), np.asarray(Ag), atol=1e-4)


def test_unicycle_stagewise_matches_generic():
    from optimal_control_problem_tpu.models import unicycle

    Hu = 8
    hs = (((0.0, 1.0), -0.4),)
    cfg = unicycle.make_config(
        horizon=Hu, dt=0.1, alpha=0.4, step_num=5, formulation="reduced",
        ADMM_settings={"method": "condensed", "max_iter": 500},
    )
    generic = unicycle.build(dict(cfg), halfspaces=hs)
    staged = unicycle.build(dict(cfg), halfspaces=hs, stagewise=True)
    rng = np.random.default_rng(4)
    X = jnp.asarray(rng.normal(size=(Hu * unicycle.FRAME,)) * 0.3, jnp.float32)
    P = jnp.asarray(unicycle.reference_line(Hu, 0.1), jnp.float32)
    fg, gg = generic.nlp_functions
    fs, gs = staged.nlp_functions
    np.testing.assert_allclose(float(fg(X, P)), float(fs(X, P)), rtol=1e-5)
    # Generic registry orders: dynamics rows then obstacle rows (same as
    # stagewise since there is a single halfspace applied per stage).
    np.testing.assert_allclose(
        np.asarray(gg(X, P)), np.asarray(gs(X, P)), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        generic.get_constraint_lower_bounds(),
        staged.get_constraint_lower_bounds(),
    )
    Hg, Ag = jax.jit(generic.solver._parts[1])(X, P)
    Hs, As = jax.jit(staged.solver._parts[1])(X, P)
    np.testing.assert_allclose(np.asarray(Hs), np.asarray(Hg), atol=1e-4)
    np.testing.assert_allclose(np.asarray(As), np.asarray(Ag), atol=1e-4)


def test_banded_auto_default_for_stage_structures():
    """Stage-structured problems pick the banded QP path at any horizon
    unless the user pinned a method (gen_solver auto-selection; banded
    measured faster than the dense paths at every horizon tested)."""
    from optimal_control_problem_tpu.models import cartpole

    for horizon in (8, 50):
        cfg = cartpole.make_config(horizon=horizon, dt=0.02, step_num=2)
        ocp = cartpole.build(cfg, stagewise=True)
        assert ocp._solver.options.admm.method == "banded", horizon

    pinned_cfg = cartpole.make_config(
        horizon=50, dt=0.02, step_num=2,
        ADMM_settings={"method": "kkt"},
    )
    ocp_pinned = cartpole.build(pinned_cfg, stagewise=True)
    assert ocp_pinned._solver.options.admm.method == "kkt"

    # No stage structure: the dense default is untouched.
    plain = cartpole.build(
        cartpole.make_config(horizon=50, dt=0.02, step_num=2)
    )
    assert plain._solver.options.admm.method == "kkt"


def test_batch_last_evaluators_match_vmapped():
    """build_stage_blocks_batch / build_stage_vectors_batch (the batch-last
    derivative layer the banded batch SQP path uses) must equal the
    vmapped batch-leading evaluators on every model structure."""
    from optimal_control_problem_tpu.models import quadrotor, unicycle
    from optimal_control_problem_tpu.stagewise import (
        build_stage_blocks,
        build_stage_blocks_batch,
        build_stage_vectors_batch,
        build_stagewise_parts,
    )

    rng = np.random.default_rng(5)
    cases = [
        cartpole.stage_structure(6, 0.04),
        unicycle.stage_structure(5, 0.1),
        quadrotor.stage_structure(4, 0.02),
    ]
    for ss in cases:
        B = 7
        n = ss.horizon * ss.frame_size
        n_p = ss.ref_frame_size * ss.horizon if ss.ref_frame_size else 3
        if ss.ref_frame_size == 0:
            n_p = 1  # scalar-style reference broadcast to every stage
        x = jnp.asarray(rng.normal(size=(B, n)), jnp.float32)
        p = jnp.asarray(rng.normal(size=(B, n_p)), jnp.float32)

        for reg in ("auto", 0.0, 0.5):
            lead = jax.vmap(build_stage_blocks(ss, jnp.float32, reg))(x, p)
            HbT, J0T, J1T, JcT = build_stage_blocks_batch(
                ss, jnp.float32, reg
            )(x.T, p.T)
            last = [jnp.moveaxis(a, -1, 0) for a in (HbT, J0T, J1T, JcT)]
            for a, b, name in zip(lead, last, ("Hb", "J0", "J1", "Jc")):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6,
                    err_msg=f"{name} mismatch (reg={reg})",
                )

        _, _, vectors, _ = build_stagewise_parts(ss, jnp.float32)
        g_lead, c_lead = jax.vmap(vectors)(x, p)
        gT, cT = build_stage_vectors_batch(ss, jnp.float32)(x.T, p.T)
        np.testing.assert_allclose(
            np.asarray(g_lead), np.asarray(gT.T), rtol=2e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(c_lead), np.asarray(cT.T), rtol=2e-5, atol=1e-6
        )
