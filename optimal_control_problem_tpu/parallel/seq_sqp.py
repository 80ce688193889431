"""End-to-end sequence-parallel SQP: derivative evaluation AND the QP solve
with the horizon sharded across the mesh.

Each device owns ``C = N / D`` stages of the trajectory.  Per SQP iteration,
entirely inside one ``shard_map`` program:

* stage-block derivatives (Hessian / dynamics Jacobians / stage-constraint
  Jacobians) are computed locally by ``vmap`` over the device's stages —
  one ``ppermute`` fetches the boundary frame from the right neighbor for
  the dynamics pairs;
* the local QP is solved by :func:`.seq_admm.seq_admm_local` (SPIKE
  factorization + sharded ADMM);
* the damped update ``x += alpha * dx`` is local.

This scales MPC horizons across chips the way context parallelism scales
sequence length (SURVEY.md sections 2, 5) — nothing global is ever
materialized.

Scope: reduced formulation.  QP warm starts are threaded across SQP
iterations (the ``warm`` carry) and rho adapts round-based inside
:func:`.seq_admm.seq_admm_local` when ``settings.adaptive_rho`` is on.

2-D meshes: pass ``batch_axis`` and batched ``(B, N, w)`` inputs to shard
scenarios over one mesh axis and the horizon over another — the per-scenario
computation (including its 'h'-axis collectives) is ``vmap``-ed over the
local scenario shard, giving the full pod-slice layout
``(scenario dp) x (horizon sp)``.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..solvers.admm import ADMMSettings, f32_matmuls
from ..stagewise import StageStructure
from .seq_admm import seq_admm_local

__all__ = ["sqp_solve_seq_parallel"]


# Compiled-program cache: building ``jax.jit(shard_map(...))`` fresh per
# call retraces and re-lowers the whole sharded program EVERY MPC tick —
# measured as the dominant share of the 1-device sequence-parallel "tax"
# (docs/PERFORMANCE.md round 4: ~13-14x vs the single-device path; round 5
# re-measured after this cache).  Keyed by object identity for ``ss`` /
# ``admm`` (StageStructure may hold unhashable list bounds); the cached
# value keeps strong references so ids stay valid.
_SOLVE_CACHE: dict = {}


def sqp_solve_seq_parallel(
    ss: StageStructure,
    x0: jnp.ndarray,  # (N, w) initial trajectory (frames)
    ref: jnp.ndarray,  # (N, ref_dim) per-stage references
    lx: jnp.ndarray,  # (N, w) box bounds (first frame pre-pinned by caller)
    ux: jnp.ndarray,
    *,
    sqp_iters: int,
    alpha: float,
    admm: ADMMSettings,
    mesh: Mesh,
    axis: str = "h",
    batch_axis: str | None = None,
    hessian_reg: float = 1e-6,
    line_search: str = "none",
    ls_num: int = 8,
    ls_alpha_max: float = 1.0,
    ls_merit_mu: float = 10.0,
):
    """Run ``sqp_iters`` damped SQP iterations with everything sharded over
    ``mesh[axis]``.  Returns the final trajectory (N, w), or (B, N, w) when
    ``batch_axis`` is given and inputs carry a leading scenario dim."""
    if batch_axis is not None:
        N, w = x0.shape[1:]
    else:
        N, w = x0.shape
    key = (
        id(ss), id(admm), mesh, axis, batch_axis, x0.shape, x0.dtype.name,
        sqp_iters, float(alpha), float(hessian_reg), line_search,
        ls_num, float(ls_alpha_max), float(ls_merit_mu),
    )
    cached = _SOLVE_CACHE.get(key)
    if cached is not None:
        _, _, spec_c, solve_c, D_c = cached
        shard = NamedSharding(mesh, spec_c)
        put = lambda a: jax.device_put(a, shard)
        x, its, status = solve_c(put(x0), put(ref), put(lx), put(ux))
        if batch_axis is None:
            return x, its.reshape(D_c, -1)[0], status.reshape(D_c, sqp_iters, 3)[0]
        return (x, its[:, 0], status[:, 0])
    D = mesh.shape[axis]
    C = N // D
    if C * D != N or C < 2:
        raise ValueError(f"horizon {N} must split into >=2 stages per device over {D}")
    if ss.ref_frame_size <= 0:
        raise ValueError("sequence-parallel SQP requires per-stage references")
    r = ss.dynamics_size if ss.dynamics is not None else 0
    r2 = (
        len(jnp.atleast_1d(jnp.asarray(ss.stage_constraints[1])))
        if ss.stage_constraints is not None
        else 0
    )
    dtype = x0.dtype
    sync_axes = (axis,) if batch_axis is None else (axis, batch_axis)

    stage_hess = jax.vmap(jax.hessian(ss.stage_cost))
    stage_grad = jax.vmap(jax.grad(ss.stage_cost))
    stage_cost_v = jax.vmap(ss.stage_cost)
    if ss.dynamics is not None:
        dyn_val = jax.vmap(ss.dynamics)
        dyn_j0 = jax.vmap(jax.jacfwd(ss.dynamics, argnums=0))
        dyn_j1 = jax.vmap(jax.jacfwd(ss.dynamics, argnums=1))
    if ss.stage_constraints is not None:
        sc_fn, sc_lb, sc_ub = ss.stage_constraints
        sc_val = jax.vmap(sc_fn)
        sc_jac = jax.vmap(jax.jacfwd(sc_fn, argnums=0))
        sc_lb = jnp.atleast_1d(jnp.asarray(sc_lb, dtype))
        sc_ub = jnp.atleast_1d(jnp.asarray(sc_ub, dtype))

    def body(x_l, ref_l, lx_l, ux_l):
        d = jax.lax.axis_index(axis)
        is_last = d == D - 1
        ks = d * C + jnp.arange(C)

        def left_shift(t):
            return jax.lax.ppermute(
                t, axis, [(i, (i - 1) % D) for i in range(D)]
            )

        def sqp_iter(carry, _):
            x_l, warm = carry
            frames = x_l
            Hb = stage_hess(frames, ref_l, ks)
            # Gershgorin convexification per block.
            sym = 0.5 * (Hb + jnp.swapaxes(Hb, -1, -2))
            diag_b = jnp.diagonal(sym, axis1=-2, axis2=-1)
            offsum = jnp.sum(jnp.abs(sym), axis=-1) - jnp.abs(diag_b)
            bound = jnp.min(diag_b - offsum, axis=-1)
            shift = jnp.maximum(jnp.asarray(0.0, dtype), hessian_reg - bound)
            Hb = Hb + shift[:, None, None] * jnp.eye(w, dtype=dtype)
            grad = stage_grad(frames, ref_l, ks)

            # Dynamics pairs (k, k+1): boundary frame from right neighbor.
            nxt_first = left_shift(frames[0])
            frames_next = jnp.concatenate([frames[1:], nxt_first[None]], 0)
            if r:
                J0 = dyn_j0(frames, frames_next)
                J1 = dyn_j1(frames, frames_next)
                dynres = dyn_val(frames, frames_next)
                # Global row N-1 is padding.
                valid = jnp.where(
                    jnp.logical_and(is_last, jnp.arange(C)[:, None] == C - 1),
                    0.0,
                    1.0,
                )
                J0 = J0 * valid[..., None]
                J1 = J1 * valid[..., None]
                dynres = dynres * valid
                ld = -dynres
                ud = -dynres
            else:
                J0 = jnp.zeros((C, 0, w), dtype)
                J1 = jnp.zeros((C, 0, w), dtype)
                ld = jnp.zeros((C, 0), dtype)
                ud = jnp.zeros((C, 0), dtype)
            if r2:
                Jc = sc_jac(frames, ref_l, ks)
                scv = sc_val(frames, ref_l, ks)
                lc = sc_lb[None, :] - scv
                uc = sc_ub[None, :] - scv
            else:
                Jc = jnp.zeros((C, 0, w), dtype)
                lc = jnp.zeros((C, 0), dtype)
                uc = jnp.zeros((C, 0), dtype)

            dx, it, done, pinf, dinf, warm_out = seq_admm_local(
                Hb,
                J0,
                J1,
                Jc,
                grad,
                lx_l - frames,
                ux_l - frames,
                ld,
                ud,
                lc,
                uc,
                settings=admm,
                axis=axis,
                D=D,
                sync_axes=sync_axes,
                warm=warm,
            )
            if line_search == "none":
                x_new = x_l + alpha * dx
            else:
                # Distributed merit line search (same L1 exact-penalty rule
                # as solvers/sqp._make_step_rule): each device sums its
                # stages' merit contribution for every candidate, one psum
                # over the horizon axis reduces them, and argmin on the
                # replicated result picks the same step everywhere.
                al = jnp.asarray(
                    ls_alpha_max * (0.5 ** np.arange(ls_num)), dtype
                )
                cand = x_l[None] + al[:, None, None] * dx[None]  # (K, C, w)

                def local_merit(xc):
                    fv = jnp.sum(stage_cost_v(xc, ref_l, ks))
                    viol = jnp.sum(
                        jnp.maximum(lx_l - xc, 0.0)
                        + jnp.maximum(xc - ux_l, 0.0)
                    )
                    if r:
                        nxt = left_shift(xc[0])
                        xc_next = jnp.concatenate([xc[1:], nxt[None]], 0)
                        resid = dyn_val(xc, xc_next) * valid
                        viol = viol + jnp.sum(jnp.abs(resid))
                    if r2:
                        scv = sc_val(xc, ref_l, ks)
                        viol = viol + jnp.sum(
                            jnp.maximum(sc_lb[None] - scv, 0.0)
                            + jnp.maximum(scv - sc_ub[None], 0.0)
                        )
                    return fv + ls_merit_mu * viol

                merits = jax.lax.psum(jax.vmap(local_merit)(cand), axis)
                x_new = x_l + al[jnp.argmin(merits)] * dx
            status = jnp.stack([done[0], pinf[0], dinf[0]])
            return (x_new, warm_out), (it[0], status)

        warm0 = (
            x_l * 0.0,
            x_l * 0.0,
            jnp.zeros((C, r), dtype) + x_l[:, :1] * 0.0,
            jnp.zeros((C, r2), dtype) + x_l[:, :1] * 0.0,
        )
        (x_l, _), (its, status) = jax.lax.scan(
            sqp_iter, (x_l, warm0), None, length=sqp_iters
        )
        # its/status are replicated (computed from collectives); emit
        # per-device and let the host read one copy.
        return x_l, its[None], status[None]

    if batch_axis is None:
        spec = P(axis)
        fn = body
        out_specs = (P(axis), P(axis), P(axis))
    else:
        spec = P(batch_axis, axis)
        out_specs = tuple(P(batch_axis, axis) for _ in range(3))

        def fn(x_b, ref_b, lx_b, ux_b):
            # vmap the per-scenario computation (its 'axis' collectives
            # batch across the local scenario shard).
            x_o, its_o, st_o = jax.vmap(body)(x_b, ref_b, lx_b, ux_b)
            return x_o, its_o, st_o

    shard = NamedSharding(mesh, spec)
    put = lambda a: jax.device_put(a, shard)
    solve = jax.jit(
        f32_matmuls(
            jax.shard_map(
                fn,
                mesh=mesh,
                in_specs=(spec, spec, spec, spec),
                out_specs=out_specs,
            )
        )
    )
    if len(_SOLVE_CACHE) >= 64:  # bound growth across test sweeps
        _SOLVE_CACHE.pop(next(iter(_SOLVE_CACHE)))
    _SOLVE_CACHE[key] = (ss, admm, spec, solve, D)
    x, its, status = solve(put(x0), put(ref), put(lx), put(ux))
    # status: per-SQP-iteration (converged, prim_inf, dual_inf) bool triples
    # — the sharded analog of SQPResult.qp_* flags.  Shape (sqp_iters, 3) in
    # the 1-D case; (B, sqp_iters, 3) with batch_axis so each scenario's QP
    # certificates are visible (the horizon-axis copies are replicated; drop
    # one of the D copies stacked along dim 1).
    if batch_axis is None:
        return x, its.reshape(D, -1)[0], status.reshape(D, sqp_iters, 3)[0]
    return (x, its[:, 0], status[:, 0])
