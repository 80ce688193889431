"""End-to-end sequence-parallel SQP vs the single-device banded SQP."""

import jax.numpy as jnp
import numpy as np
import pytest

from optimal_control_problem_tpu.models import cartpole
from optimal_control_problem_tpu.parallel import make_mesh
from optimal_control_problem_tpu.parallel.seq_sqp import sqp_solve_seq_parallel
from optimal_control_problem_tpu.solvers.admm import ADMMSettings

H, DT = 16, 0.04
# Both the sequence-parallel ADMM (distributed Ruiz) and the single-device
# banded reference (structured Ruiz) equilibrate, so default scaling is on
# and the two run the identical OSQP algorithm.
ADMM = ADMMSettings(
    eps_abs=1e-4, eps_rel=1e-4, adaptive_rho=False, rho=0.05, max_iter=2000
)
SQP_ITERS, ALPHA = 6, 0.3


def problem():
    # Cart-pole stage structure with per-stage references (required by the
    # sharded path): broadcast the target angle into a per-stage ref.
    base = cartpole.stage_structure(H, DT)
    import dataclasses

    ss = dataclasses.replace(base, ref_frame_size=1)
    cfg = cartpole.make_config(horizon=H, dt=DT)
    from optimal_control_problem_tpu.config import OCPConfig

    occ = OCPConfig(cfg)
    lx = occ.lower_bounds_flat().reshape(H, cartpole.FRAME).astype(np.float32)
    ux = occ.upper_bounds_flat().reshape(H, cartpole.FRAME).astype(np.float32)
    frame = cartpole.initial_state(th=0.4).astype(np.float32)
    lx[0] = frame
    ux[0] = frame
    ref = np.full((H, 1), np.pi, np.float32)
    return ss, lx, ux, ref


def single_device_reference(ss, lx, ux, ref):
    """Same damped SQP with the single-device banded inner solver."""
    from optimal_control_problem_tpu.solvers.admm_banded import (
        BandedQP,
        admm_solve_banded,
    )
    from optimal_control_problem_tpu.stagewise import build_stage_blocks

    blocks = build_stage_blocks(ss, jnp.float32, "auto")
    import jax

    stage_grad = jax.vmap(jax.grad(ss.stage_cost))
    dyn_val = jax.vmap(ss.dynamics)
    sc_val = jax.vmap(ss.stage_constraints[0])
    sc_lb = np.atleast_1d(ss.stage_constraints[1]).astype(np.float32)
    sc_ub = np.atleast_1d(ss.stage_constraints[2]).astype(np.float32)
    ks = jnp.arange(H)
    x = jnp.zeros((H * cartpole.FRAME,), jnp.float32)
    refs = jnp.asarray(ref)
    for _ in range(SQP_ITERS):
        frames = x.reshape(H, cartpole.FRAME)
        Hb, J0, J1, Jc = blocks(x, refs.reshape(-1))
        grad = stage_grad(frames, refs, ks).reshape(-1)
        dynres = dyn_val(frames[:-1], frames[1:])
        scv = sc_val(frames, refs, ks)
        l = jnp.concatenate(
            [
                (jnp.asarray(lx) - frames).reshape(-1),
                (-dynres).reshape(-1),
                (sc_lb[None] - scv).reshape(-1),
            ]
        )
        u = jnp.concatenate(
            [
                (jnp.asarray(ux) - frames).reshape(-1),
                (-dynres).reshape(-1),
                (sc_ub[None] - scv).reshape(-1),
            ]
        )
        qp = BandedQP(Hb=Hb, J0=J0, J1=J1, Jc=Jc, q=grad, l=l, u=u)
        sol = admm_solve_banded(qp, ADMM)
        x = x + ALPHA * sol.x
    return np.asarray(x).reshape(H, cartpole.FRAME)


def test_seq_sqp_matches_single_device():
    mesh = make_mesh(("h",))
    ss, lx, ux, ref = problem()
    x0 = np.zeros((H, cartpole.FRAME), np.float32)
    x_seq, its, qp_status = sqp_solve_seq_parallel(
        ss,
        jnp.asarray(x0),
        jnp.asarray(ref),
        jnp.asarray(lx),
        jnp.asarray(ux),
        sqp_iters=SQP_ITERS,
        alpha=ALPHA,
        admm=ADMM,
        mesh=mesh,
        axis="h",
    )
    assert its.shape == (SQP_ITERS,)
    # Per-SQP-iteration QP status triples (converged, prim_inf, dual_inf):
    # warm-started QPs converge within the test's iteration budget (the
    # cold first QP may hit max_iter), none certify infeasible/unbounded.
    assert qp_status.shape == (SQP_ITERS, 3)
    assert bool(jnp.all(qp_status[1:, 0]))
    assert not bool(jnp.any(qp_status[:, 1:]))
    x_ref = single_device_reference(ss, lx, ux, ref)
    assert np.isfinite(np.asarray(x_seq)).all()
    # The sharded path warm-starts its QPs across SQP iterations while the
    # reference loop here is cold-started, so intermediate damped iterates
    # agree to QP-tolerance scale, not bitwise.
    np.testing.assert_allclose(np.asarray(x_seq), x_ref, atol=5e-2)


def test_seq_sqp_2d_mesh_batch_by_horizon():
    """Scenarios x horizon on a 2-D (2, 4) mesh: each scenario's result must
    match its own 1-D horizon-sharded solve."""
    from optimal_control_problem_tpu.parallel import make_mesh as _mm

    mesh2d = _mm(("b", "h"), shape=(2, 4))
    ss, lx, ux, ref = problem()
    B = 4
    rng = np.random.default_rng(5)
    x0 = np.zeros((B, H, cartpole.FRAME), np.float32)
    lxb = np.tile(lx[None], (B, 1, 1))
    uxb = np.tile(ux[None], (B, 1, 1))
    # Different pinned first frame per scenario.
    for b in range(B):
        fr = cartpole.initial_state(th=0.2 + 0.1 * b).astype(np.float32)
        lxb[b, 0] = fr
        uxb[b, 0] = fr
    refb = np.tile(ref[None], (B, 1, 1))

    x2d, its, _st2d = sqp_solve_seq_parallel(
        ss,
        jnp.asarray(x0),
        jnp.asarray(refb),
        jnp.asarray(lxb),
        jnp.asarray(uxb),
        sqp_iters=4,
        alpha=ALPHA,
        admm=ADMM,
        mesh=mesh2d,
        axis="h",
        batch_axis="b",
    )
    assert x2d.shape == (B, H, cartpole.FRAME)
    assert np.isfinite(np.asarray(x2d)).all()

    mesh1d = _mm(("h",), shape=(4,), devices=list(mesh2d.devices[0]))
    for b in range(B):
        x1d, _, _ = sqp_solve_seq_parallel(
            ss,
            jnp.asarray(x0[b]),
            jnp.asarray(refb[b]),
            jnp.asarray(lxb[b]),
            jnp.asarray(uxb[b]),
            sqp_iters=4,
            alpha=ALPHA,
            admm=ADMM,
            mesh=mesh1d,
            axis="h",
        )
        # 2-D runs synchronize QP termination across scenarios (multi-axis
        # pmax), so per-scenario ADMM iteration counts differ from the 1-D
        # runs: agreement is to QP-tolerance scale, not bitwise.
        np.testing.assert_allclose(
            np.asarray(x2d[b]), np.asarray(x1d), atol=5e-3,
            err_msg=f"scenario {b}",
        )


def test_seq_sqp_merit_line_search():
    """Distributed merit line search: converges at least as well as the
    fixed step at identical SQP budget, and stays finite."""
    mesh = make_mesh(("h",))
    ss, lx, ux, ref = problem()
    x0 = np.zeros((H, cartpole.FRAME), np.float32)
    common = dict(sqp_iters=SQP_ITERS, admm=ADMM, mesh=mesh, axis="h")
    x_fixed, _, _ = sqp_solve_seq_parallel(
        ss, jnp.asarray(x0), jnp.asarray(ref), jnp.asarray(lx),
        jnp.asarray(ux), alpha=ALPHA, **common,
    )
    x_ls, _, _ = sqp_solve_seq_parallel(
        ss, jnp.asarray(x0), jnp.asarray(ref), jnp.asarray(lx),
        jnp.asarray(ux), alpha=ALPHA, line_search="merit", **common,
    )
    assert np.isfinite(np.asarray(x_ls)).all()

    def merit(x):
        import jax as _jax
        frames = jnp.asarray(x)
        ks = jnp.arange(H)
        fv = jnp.sum(_jax.vmap(ss.stage_cost)(frames, jnp.asarray(ref), ks))
        dynres = _jax.vmap(ss.dynamics)(frames[:-1], frames[1:])
        viol = jnp.sum(jnp.abs(dynres))
        viol += jnp.sum(jnp.maximum(jnp.asarray(lx) - frames, 0)
                        + jnp.maximum(frames - jnp.asarray(ux), 0))
        return float(fv + 10.0 * viol)

    # The line-searched iterate must be at least as good in merit.
    assert merit(np.asarray(x_ls)) <= merit(np.asarray(x_fixed)) + 1e-3
