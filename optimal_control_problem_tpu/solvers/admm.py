"""OSQP-style ADMM quadratic-program solver, TPU-native.

This replaces the reference's entire L1 QP stack — ``CuCaQP`` (the
CasADi-DM -> Eigen-sparse -> OsqpEigen bridge,
``/root/reference/src/sqp_solver/CuCaQP.cpp``) plus the prebuilt OSQP CUDA
backend it drives (``cuda_install.sh:38``, cuBLAS/cuSPARSE links in
``CMakeLists.txt:163-164``) — with a single pure-JAX function.

Solved problem (OSQP standard form, ``SQP_readme.md:7-19``)::

    minimize    1/2 x^T P x + q^T x
    subject to  l <= A x <= u

Semantics intentionally mirrored from OSQP v1.0.0-beta1 as configured by the
reference (``SQPOptimizationSolver.cpp:80-85``): float32 arithmetic
(``OSQP_USE_FLOAT=ON``, ``cuda_install.sh:44``), ``eps_abs = eps_rel = 1e-3``,
``max_iter = 10000``, warm starting, modified-Ruiz equilibration, per-row rho
with equality/loose-bound scaling, over-relaxed ADMM iteration with
``alpha = 1.6`` and ``sigma = 1e-6``.

TPU-first design choices (vs OSQP's sparse LDL^T / CUDA PCG):

* The linear system is solved by **precomputing an explicit inverse** of the
  (quasi-definite) KKT matrix once per setup / rho update.  Each ADMM
  iteration is then a single dense matvec — MXU/VPU work with no
  data-dependent control flow, which batches perfectly under ``vmap``.
* Everything lives in one jitted program: no per-iteration host round trips,
  no solver re-initialization (the reference re-converts and re-uploads the
  whole problem every SQP iteration, ``SQPOptimizationSolver.cpp:155-157``).
* Termination runs in chunks of ``check_every`` iterations inside a
  ``lax.while_loop`` so converged problems exit early while remaining
  entirely on device.

The module is written for a single problem; batch by ``jax.vmap`` (thousands
of independent QPs per chip) — see ``parallel/batch.py``.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

__all__ = [
    "ADMMSettings",
    "QPSolution",
    "admm_solve",
    "ruiz_equilibrate",
    "f32_matmuls",
]


def f32_matmuls(fn=None, *, precision: str = "highest"):
    """Trace ``fn`` with elevated matmul precision (default HIGHEST).

    On TPU the default float32 matmul runs as a single bfloat16 MXU pass;
    that floors ADMM/KKT residuals far above the 1e-3 termination tolerance
    (the solve must be genuinely float32, like the reference's OSQP build
    with ``OSQP_USE_FLOAT=ON``, cuda_install.sh:44).  Applied to every
    solver-internal function that feeds residuals or factorizations.
    Usable bare (``@f32_matmuls``) or parameterized
    (``@f32_matmuls(precision="high")``).
    """
    import functools

    def deco(f):
        @functools.wraps(f)
        def wrapped(*args, **kwargs):
            with jax.default_matmul_precision(precision):
                return f(*args, **kwargs)

        return wrapped

    if fn is not None:
        return deco(fn)
    return deco

# OSQP constants (osqp v1.0.0-beta1 defaults; the reference overrides only the
# tolerances/max_iter listed in SQPOptimizationSolver.cpp:80-85).
_RHO_MIN = 1e-6
_RHO_MAX = 1e6
_RHO_EQ_OVER_RHO_INEQ = 1e3
_RHO_TOL = 1e-4
_MIN_SCALING = 1e-4
_MAX_SCALING = 1e4


@dataclasses.dataclass(frozen=True)
class ADMMSettings:
    """Static solver settings (hashable; safe to close over under jit)."""

    rho: float = 0.1
    sigma: float = 1e-6
    alpha: float = 1.6  # over-relaxation
    eps_abs: float = 1e-3  # SQPOptimizationSolver.cpp:83
    eps_rel: float = 1e-3  # SQPOptimizationSolver.cpp:84
    max_iter: int = 10000  # SQPOptimizationSolver.cpp:85
    check_every: int = 25  # OSQP check_termination default
    scaling_iters: int = 10  # OSQP scaling default
    # When to recompute Ruiz equilibration on the banded batch SQP path:
    # "step" (default) runs it fresh for every SQP iteration's QP — the
    # reference behavior (CuCaQP full re-setup per iteration,
    # CuCaQP.cpp:271-288 -> OSQP setup scaling).  "tick" computes the
    # scalings ONCE per solve call from the first linearization and
    # reuses them across all SQP iterations: the scalings are a pure
    # preconditioner (termination tests run on UNSCALED residuals either
    # way, and per-row rho types are shift-invariant), so semantics are
    # OSQP-exact while the per-step prepare cost drops by ~scaling_iters
    # passes over the operator blocks.  Warm-started MPC re-linearizes
    # near the previous iterate, so the stale preconditioner costs at
    # most a few ADMM iterations (measured: none at steady state).
    scaling_refresh: str = "step"
    adaptive_rho: bool = True
    adaptive_rho_interval: int = 100
    adaptive_rho_tolerance: float = 5.0
    method: str = "kkt"  # "kkt" (robust, quasi-definite) | "condensed" (fast)
    # Linear solver inside method="banded": "thomas" (block LDL^T scan,
    # O(N) depth — right when a large scenario batch fills each scan step)
    # or "cr" (odd-even cyclic reduction, ~2 log2 N depth at ~2x flops —
    # right for small batches / long horizons where the scan's sequential
    # latency dominates).
    banded_solver: str = "thomas"
    # Iteration-loop backend: "xla" (lax.while_loop) or "pallas" (fused
    # in-VMEM device loops).  On the per-scenario dense path this is
    # ops/admm_kernel.py (condensed only, no adaptive rho; the win for
    # vmapped nonlinear models).  On the shared-factorization batched path
    # it is ops/shared_kernel.py (condensed only, full adaptive rho +
    # certificates via chunked re-entry) — measured at parity with the XLA
    # loop at flagship sizes (the XLA loop already hides the panel HBM
    # traffic), kept as a validated alternative; see docs/PERFORMANCE.md.
    # The Pallas kernels compute at fixed f32-HIGHEST; when combined with
    # precision != "highest" the shared-factorization path falls back to
    # the XLA loop so the two backends cannot silently diverge.
    backend: str = "xla"
    # Matmul precision for solver-internal linear algebra.  "highest"
    # (6-pass) is the safe default on TPU (see f32_matmuls); "high"
    # (3-pass bf16) trades ~2x matmul cost for a slightly earlier float32
    # noise floor - validate convergence before enabling.
    precision: str = "highest"
    # Precision of the ITERATION GEMMs only (shared-factorization condensed
    # path, XLA and Pallas backends).  Unlike ``precision`` (which lowers
    # everything, including the termination residuals — measured in round 3
    # to balloon iteration counts ~17x because the residual check itself
    # floats on the 3-pass noise floor), this knob keeps the RESIDUAL
    # matvecs and the factorization at "highest" and lowers only the
    # per-iteration x/z-update products:
    #   "highest" — 6-pass everywhere (default; bit-compatible with r04);
    #   "high"    — all three iteration GEMMs at 3-pass.  Termination still
    #               requires the full-precision residuals to pass, so a
    #               solution that terminates is exactly as accurate as the
    #               default path; the risk is extra iterations if 3-pass
    #               noise stalls the fixed point above eps (measure!);
    #   "mixed"   — x-update chain (rhs assembly + solve) at 3-pass, but
    #               the z-projection argument ``zt = xt @ A^T`` at 6-pass:
    #               zt feeds the RUNNING dual accumulator y directly, so
    #               this variant keeps noise out of the one quantity that
    #               integrates across iterations.
    iter_precision: str = "highest"
    # Single-GEMM condensed iteration (shared-factorization batched path
    # only): algebraically fold the three per-iteration products
    # (rhs assembly, x-update, z-projection argument) into ONE
    # (B, n+m) @ (n+m, n+m) GEMM against the precomputed block operator
    # [[OP, OP A^T], [A OP, A OP A^T]].  ~1.6x the flops of the 3-GEMM
    # form but one MXU launch instead of three at a better aspect ratio —
    # wins when the per-iteration GEMMs are pipeline-bound, which is what
    # the headline roofline measured (26% MFU, docs/PERFORMANCE.md).
    # Same fixed point and tolerances; f32 accumulation differs from the
    # 3-GEMM form, so iterates are not bitwise comparable.
    fused_gemm: bool = False
    # OSQP-style solution polishing: after convergence, re-solve the
    # equality-constrained KKT system on the detected active set (masked
    # formulation, delta-regularized, one iterative-refinement step) and
    # accept the polished point if it improves both residuals.  Lifts
    # accuracy from the 1e-3 ADMM tolerance to near float32 precision.
    polish: bool = False
    polish_delta: float = 1e-6
    # OSQP infeasibility detection (Banjac et al., "Infeasibility detection
    # in the ADMM algorithm"): the successive-iterate differences delta_x /
    # delta_y converge to dual / primal infeasibility certificates when the
    # QP is unbounded / infeasible.  Checked every ``check_every`` iterations
    # on unscaled quantities; tolerances are the OSQP defaults.
    check_infeasibility: bool = True
    eps_prim_inf: float = 1e-4
    eps_dual_inf: float = 1e-4

    def __post_init__(self):
        if self.scaling_refresh not in ("step", "tick"):
            raise ValueError(
                f"scaling_refresh must be 'step' or 'tick', got "
                f"{self.scaling_refresh!r}"
            )
        if self.banded_solver not in ("thomas", "cr"):
            raise ValueError(
                f"banded_solver must be 'thomas' or 'cr', got "
                f"{self.banded_solver!r}"
            )
        if self.iter_precision not in ("highest", "high", "mixed"):
            raise ValueError(
                f"iter_precision must be 'highest', 'high' or 'mixed', "
                f"got {self.iter_precision!r}"
            )

    def replace(self, **kw) -> "ADMMSettings":
        return dataclasses.replace(self, **kw)


class QPSolution(NamedTuple):
    x: jnp.ndarray  # primal solution (n,)
    y: jnp.ndarray  # dual solution (m,)
    z: jnp.ndarray  # constraint-space iterate, z in [l, u] (m,)
    iters: jnp.ndarray  # iterations used (scalar int32)
    converged: jnp.ndarray  # bool scalar
    r_prim: jnp.ndarray  # final unscaled primal residual (inf-norm)
    r_dual: jnp.ndarray  # final unscaled dual residual (inf-norm)
    # OSQP-style infeasibility certificates.  When ``prim_inf`` is True the
    # problem is primal infeasible and delta-y (not returned; its direction
    # is ``y``'s divergence ray) certifies it; ``dual_inf`` marks an
    # unbounded (dual-infeasible) problem.  Both False for the Pallas
    # backend and for solvers that predate the check.
    prim_inf: jnp.ndarray = False  # noqa: RUF009 - NamedTuple default
    dual_inf: jnp.ndarray = False


def _limit_scaling(v: jnp.ndarray) -> jnp.ndarray:
    """OSQP ``limit_scaling``: tiny norms -> 1 (no scaling), clamp large."""
    v = jnp.where(v < _MIN_SCALING, 1.0, v)
    return jnp.minimum(v, _MAX_SCALING)


def ruiz_equilibrate(P, q, A, iters: int):
    """Modified Ruiz equilibration of [[P, A^T], [A, 0]] with cost scaling.

    Returns (Pb, qb, Ab, D, E, c) such that Pb = c*D@P@D, qb = c*D*q,
    Ab = E*A*D (diagonal scalings as vectors).  Mirrors OSQP ``scale.c``.
    """
    n = P.shape[0]
    m = A.shape[0]
    dtype = P.dtype
    D = jnp.ones((n,), dtype)
    E = jnp.ones((m,), dtype)
    c = jnp.asarray(1.0, dtype)

    def body(_, carry):
        D, E, c = carry
        Pb = c * (D[:, None] * P * D[None, :])
        Ab = E[:, None] * A * D[None, :]
        # column inf-norms of [Pb; Ab] -> x-block scaling
        norm_x = jnp.maximum(
            jnp.max(jnp.abs(Pb), axis=0), jnp.max(jnp.abs(Ab), axis=0) if m else 0.0
        )
        # column inf-norms of [Ab^T] -> constraint-block scaling
        delta_x = 1.0 / jnp.sqrt(_limit_scaling(norm_x))
        D = D * delta_x
        if m:
            norm_z = jnp.max(jnp.abs(Ab), axis=1)
            delta_z = 1.0 / jnp.sqrt(_limit_scaling(norm_z))
            E = E * delta_z
        # cost scaling: gamma = 1/max(mean col-norm of Pb, ||qb||_inf)
        Pb = c * (D[:, None] * P * D[None, :])
        qb = c * D * q
        mean_pcol = jnp.mean(jnp.max(jnp.abs(Pb), axis=0))
        gamma = 1.0 / _limit_scaling(
            jnp.maximum(mean_pcol, jnp.max(jnp.abs(qb)))
        )
        c = c * gamma
        return D, E, c

    if iters > 0:
        D, E, c = jax.lax.fori_loop(0, iters, body, (D, E, c))
    Pb = c * (D[:, None] * P * D[None, :])
    qb = c * D * q
    Ab = E[:, None] * A * D[None, :]
    return Pb, qb, Ab, D, E, c


def _rho_vec(l, u, rho, dtype):
    """Per-row rho: loose bounds -> RHO_MIN, equalities -> rho * 1e3 (OSQP)."""
    loose = jnp.logical_and(l <= -jnp.inf, u >= jnp.inf)
    eq = (u - l) < _RHO_TOL
    rho_v = jnp.full(l.shape, rho, dtype)
    rho_v = jnp.where(eq, jnp.clip(rho * _RHO_EQ_OVER_RHO_INEQ, _RHO_MIN, _RHO_MAX), rho_v)
    rho_v = jnp.where(loose, _RHO_MIN, rho_v)
    return rho_v


def _factor(Pb, Ab, rho_v, sigma, method: str):
    """Precompute the per-iteration solve operator as an explicit inverse."""
    n = Pb.shape[0]
    m = Ab.shape[0]
    if method == "condensed":
        M = Pb + sigma * jnp.eye(n, dtype=Pb.dtype) + (Ab.T * rho_v[None, :]) @ Ab
        return jnp.linalg.inv(M)
    # Quasi-definite KKT matrix [[P + sigma I, A^T], [A, -diag(1/rho)]]:
    # always invertible, tolerates indefinite P (the reference's non-convex
    # test case 8, test.cpp:188-211, exercises this).
    K = jnp.zeros((n + m, n + m), dtype=Pb.dtype)
    K = K.at[:n, :n].set(Pb + sigma * jnp.eye(n, dtype=Pb.dtype))
    K = K.at[:n, n:].set(Ab.T)
    K = K.at[n:, :n].set(Ab)
    K = K.at[n:, n:].set(jnp.diag(-1.0 / rho_v))
    return jnp.linalg.inv(K)


@partial(jax.jit, static_argnames=("settings",))
def admm_solve(
    P: jnp.ndarray,
    q: jnp.ndarray,
    A: jnp.ndarray,
    l: jnp.ndarray,
    u: jnp.ndarray,
    settings: ADMMSettings = ADMMSettings(),
    x0: Optional[jnp.ndarray] = None,
    y0: Optional[jnp.ndarray] = None,
) -> QPSolution:
    """Solve one QP.  All arrays dense; use IEEE +-inf for absent bounds.

    ``x0``/``y0`` warm-start the iteration (OSQP ``warm_start``,
    ``SQPOptimizationSolver.cpp:82``).
    """
    with jax.default_matmul_precision(settings.precision):
        return _admm_solve_impl(P, q, A, l, u, settings, x0, y0)


def _admm_solve_impl(P, q, A, l, u, settings, x0, y0):
    dtype = P.dtype
    n = P.shape[0]
    m = A.shape[0]
    q = q.astype(dtype)
    A = A.astype(dtype)
    l = l.astype(dtype)
    u = u.astype(dtype)
    # Guard against inverted bounds from float noise.
    l = jnp.minimum(l, u)

    st = settings
    sigma = jnp.asarray(st.sigma, dtype)
    alpha = jnp.asarray(st.alpha, dtype)

    Pb, qb, Ab, D, E, c = ruiz_equilibrate(P, q, A, st.scaling_iters)
    lb = E * l
    ub = E * u
    rho_v = _rho_vec(lb, ub, jnp.asarray(st.rho, dtype), dtype)
    OP = _factor(Pb, Ab, rho_v, sigma, st.method)

    x = jnp.zeros((n,), dtype) if x0 is None else (x0.astype(dtype) / D)
    y = jnp.zeros((m,), dtype) if y0 is None else (c * y0.astype(dtype) / E)
    z = jnp.clip(Ab @ x, lb, ub)

    def one_iter(carry, _):
        x, z, y, rho_v, OP = carry
        if st.method == "condensed":
            rhs = sigma * x - qb + Ab.T @ (rho_v * z - y)
            xt = OP @ rhs
            zt = Ab @ xt
        else:
            rhs = jnp.concatenate([sigma * x - qb, z - y / rho_v])
            sol = OP @ rhs
            xt = sol[:n]
            zt = z + (sol[n:] - y) / rho_v
        x_new = alpha * xt + (1 - alpha) * x
        z_relaxed = alpha * zt + (1 - alpha) * z
        z_new = jnp.clip(z_relaxed + y / rho_v, lb, ub)
        y_new = y + rho_v * (z_relaxed - z_new)
        return (x_new, z_new, y_new, rho_v, OP), None

    def residuals(x, z, y):
        Ax = Ab @ x
        Px = Pb @ x
        Aty = Ab.T @ y
        Einv = 1.0 / E
        Dinv = 1.0 / D
        cinv = 1.0 / c
        r_prim = jnp.max(jnp.abs((Ax - z) * Einv)) if m else jnp.asarray(0.0, dtype)
        r_dual = cinv * jnp.max(jnp.abs((Px + qb + Aty) * Dinv))
        max_prim = (
            jnp.maximum(jnp.max(jnp.abs(Ax * Einv)), jnp.max(jnp.abs(z * Einv)))
            if m
            else jnp.asarray(0.0, dtype)
        )
        max_dual = cinv * jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(Aty * Dinv)), jnp.max(jnp.abs(Px * Dinv))),
            jnp.max(jnp.abs(qb * Dinv)),
        )
        eps_pri = st.eps_abs + st.eps_rel * max_prim
        eps_dua = st.eps_abs + st.eps_rel * max_dual
        return r_prim, r_dual, eps_pri, eps_dua, max_prim, max_dual

    def infeasibility_certificates(dx_u, dy_u):
        """OSQP is_primal_infeasible / is_dual_infeasible on unscaled deltas.

        ``dx_u``/``dy_u`` are the unscaled changes of (x, y) over one
        termination-check block; when the QP is infeasible/unbounded they
        align with the certificate rays of Banjac et al.  All tests use the
        ORIGINAL (unscaled) P, q, A, l, u, as OSQP does (auxil.c).
        """
        tiny = jnp.asarray(1e-12, dtype)
        # -- primal infeasibility: delta_y with A^T dy ~ 0 and support
        #    function u'(dy)_+ + l'(dy)_- < 0.
        if m:
            ndy = jnp.max(jnp.abs(dy_u))
            dy_p = jnp.maximum(dy_u, 0.0)
            dy_m = jnp.minimum(dy_u, 0.0)
            # Masked products so inf * 0 cannot produce NaN; an infinite
            # bound with matching delta sign yields +inf, which correctly
            # blocks certification.
            t_u = jnp.where(dy_p > 0, u * dy_p, 0.0)
            t_l = jnp.where(dy_m < 0, l * dy_m, 0.0)
            support = jnp.sum(t_u + t_l)
            n_Atdy = jnp.max(jnp.abs(A.T @ dy_u))
            prim_inf = jnp.logical_and(
                ndy > tiny,
                jnp.logical_and(
                    support < -st.eps_prim_inf * ndy,
                    n_Atdy < st.eps_prim_inf * ndy,
                ),
            )
        else:
            prim_inf = jnp.asarray(False)
        # -- dual infeasibility: delta_x with P dx ~ 0, q'dx < 0 and A dx
        #    consistent with a feasible recession direction.
        ndx = jnp.max(jnp.abs(dx_u)) if n else jnp.asarray(0.0, dtype)
        thr = st.eps_dual_inf * ndx
        cond_q = (q @ dx_u) < -thr
        cond_P = jnp.max(jnp.abs(P @ dx_u)) < thr
        if m:
            Adx = A @ dx_u
            cond_A = jnp.logical_and(
                jnp.all(jnp.where(u < jnp.inf, Adx < thr, True)),
                jnp.all(jnp.where(l > -jnp.inf, Adx > -thr, True)),
            )
        else:
            cond_A = jnp.asarray(True)
        dual_inf = jnp.logical_and(
            ndx > tiny,
            jnp.logical_and(cond_q, jnp.logical_and(cond_P, cond_A)),
        )
        return prim_inf, dual_inf

    def adapt_rho(rho_v, OP, r_prim, r_dual, max_prim, max_dual, done):
        """OSQP adaptive rho: rescale by sqrt(relative residual ratio) and
        refactor when the change crosses the tolerance."""
        num = r_prim / jnp.maximum(max_prim, 1e-10)
        den = r_dual / jnp.maximum(max_dual, 1e-10)
        scale = jnp.sqrt(num / jnp.maximum(den, 1e-10))
        scale = jnp.clip(scale, 1e-3, 1e3)
        trigger = jnp.logical_or(
            scale > st.adaptive_rho_tolerance,
            scale < 1.0 / st.adaptive_rho_tolerance,
        )

        def adapt(_):
            new_rho = jnp.clip(rho_v * scale, _RHO_MIN, _RHO_MAX)
            return new_rho, _factor(Pb, Ab, new_rho, sigma, st.method)

        return jax.lax.cond(
            jnp.logical_and(trigger, jnp.logical_not(done)),
            adapt,
            lambda _: (rho_v, OP),
            None,
        )

    if st.backend == "pallas":
        if st.method != "condensed":
            raise ValueError("backend='pallas' requires method='condensed'")
        # The kernel pins OP, A, A^T and P in VMEM.  Budget = the chip's
        # real VMEM (~128 MB on v5e, probed — see ops/banded_kernel) over
        # the pipeline's double buffering (under vmap the grid is the
        # scenario batch and each program's operators are grid-varying),
        # minus margin for live loop values.
        vmem_bytes = 4 * (2 * n * n + 2 * m * n + 4 * (n + m))
        if vmem_bytes > 40 * 1024 * 1024:
            raise ValueError(
                f"backend='pallas' would need ~{vmem_bytes / 1e6:.1f} MB of "
                "VMEM for this problem size (n={}, m={}); use backend='xla' "
                "or method='banded'".format(n, m)
            )
        from ..ops.admm_kernel import admm_device_loop

        # The kernel runs one rho-constant chunk fully in VMEM; rho
        # adaptation (a refactorization) and infeasibility certificates run
        # in XLA between chunks — OSQP's adapt-every-interval semantics.
        # With adaptive rho off the whole budget is a single kernel entry.
        ce = st.check_every
        if st.adaptive_rho and m:
            interval = max(st.adaptive_rho_interval, ce)
            interval = ((interval + ce - 1) // ce) * ce
        else:
            interval = st.max_iter
        interp = jax.default_backend() != "tpu"

        def kernel_round(OP, rho_v, x, y):
            return admm_device_loop(
                OP, Ab, Pb, qb, lb, ub, rho_v,
                1.0 / D, 1.0 / E, 1.0 / c,
                st.sigma, st.alpha, st.eps_abs, st.eps_rel,
                x, y,
                max_iter=interval, check_every=ce, interpret=interp,
            )

        def p_cond(state):
            it, x, z, y, rho_v, OP, done, pinf, dinf, rp, rd = state
            stop = jnp.logical_or(done, jnp.logical_or(pinf, dinf))
            return jnp.logical_and(it < st.max_iter, jnp.logical_not(stop))

        def p_body(state):
            it, x, z, y, rho_v, OP, done, pinf, dinf, _, _ = state
            x_old, y_old = x, y
            xs, ys, zs, kit = kernel_round(OP, rho_v, x, y)
            it = it + kit
            r_prim, r_dual, eps_pri, eps_dua, max_prim, max_dual = residuals(
                xs, zs, ys
            )
            done = jnp.logical_and(r_prim <= eps_pri, r_dual <= eps_dua)
            if st.check_infeasibility:
                pinf, dinf = infeasibility_certificates(
                    D * (xs - x_old), E * (ys - y_old) / c
                )
                pinf = jnp.logical_and(pinf, jnp.logical_not(done))
                dinf = jnp.logical_and(dinf, jnp.logical_not(done))
            if st.adaptive_rho and m:
                rho_v, OP = adapt_rho(
                    rho_v, OP, r_prim, r_dual, max_prim, max_dual, done
                )
            return (it, xs, zs, ys, rho_v, OP, done, pinf, dinf, r_prim, r_dual)

        f0 = jnp.asarray(False)
        inf0 = jnp.asarray(jnp.inf, dtype)
        state = (jnp.asarray(0, jnp.int32), x, z, y, rho_v, OP, f0, f0, f0, inf0, inf0)
        it, x, z, y, rho_v, OP, done, pinf, dinf, r_prim, r_dual = (
            jax.lax.while_loop(p_cond, p_body, state)
        )
        if st.polish and m:
            x, y, z, r_prim, r_dual = _polish(
                Pb, qb, Ab, lb, ub, x, y, z, r_prim, r_dual, residuals, st, dtype
            )
        return QPSolution(
            x=D * x,
            y=E * y / c,
            z=z / E,
            iters=it,
            converged=done,
            r_prim=r_prim,
            r_dual=r_dual,
            prim_inf=pinf,
            dual_inf=dinf,
        )

    # Round-based iteration: rho (and the factorization) are constant for
    # one adaptation interval, adaptation happens BETWEEN rounds.  This
    # matters under vmap: a per-check-block lax.cond would lower to a
    # select that evaluates BOTH branches — i.e. a full refactorization
    # every 25 iterations for every scenario (measured 3.8x slower on the
    # banded cart-pole path).  At round granularity the (still
    # both-branches-under-vmap) refactorization amortizes over the whole
    # interval; unbatched solves keep the cond's skip.
    if st.adaptive_rho and m:
        interval = max(st.adaptive_rho_interval, st.check_every)
        interval = (
            (interval + st.check_every - 1) // st.check_every
        ) * st.check_every
    else:
        interval = st.max_iter

    def run_round(rho_v, OP, it0, x, z, y, done, pinf, dinf):
        def icond(s):
            k, x, z, y, done, pinf, dinf, rp, rd, mp, md = s
            stop = jnp.logical_or(done, jnp.logical_or(pinf, dinf))
            return jnp.logical_and(
                k < interval,
                jnp.logical_and(it0 + k < st.max_iter, jnp.logical_not(stop)),
            )

        def ibody(s):
            k, x, z, y, done, pinf, dinf, _, _, _, _ = s
            x_old, y_old = x, y
            (x, z, y, _, _), _ = jax.lax.scan(
                one_iter, (x, z, y, rho_v, OP), None, length=st.check_every
            )
            r_prim, r_dual, eps_pri, eps_dua, max_prim, max_dual = residuals(
                x, z, y
            )
            done = jnp.logical_and(r_prim <= eps_pri, r_dual <= eps_dua)
            if st.check_infeasibility:
                pinf, dinf = infeasibility_certificates(
                    D * (x - x_old), E * (y - y_old) / c
                )
                pinf = jnp.logical_and(pinf, jnp.logical_not(done))
                dinf = jnp.logical_and(dinf, jnp.logical_not(done))
            return (
                k + st.check_every, x, z, y, done, pinf, dinf,
                r_prim, r_dual, max_prim, max_dual,
            )

        zero = jnp.asarray(jnp.inf, dtype)
        return jax.lax.while_loop(
            icond,
            ibody,
            (jnp.asarray(0, jnp.int32), x, z, y, done, pinf, dinf,
             zero, zero, zero, zero),
        )

    def cond_fn(state):
        it, x, z, y, rho_v, OP, done, pinf, dinf, rp, rd = state
        stop = jnp.logical_or(done, jnp.logical_or(pinf, dinf))
        return jnp.logical_and(it < st.max_iter, jnp.logical_not(stop))

    def body_fn(state):
        it, x, z, y, rho_v, OP, done, pinf, dinf, _, _ = state
        k, x, z, y, done, pinf, dinf, r_prim, r_dual, max_prim, max_dual = (
            run_round(rho_v, OP, it, x, z, y, done, pinf, dinf)
        )
        it = it + k
        if st.adaptive_rho and m:
            rho_v, OP = adapt_rho(
                rho_v, OP, r_prim, r_dual, max_prim, max_dual, done
            )
        return (it, x, z, y, rho_v, OP, done, pinf, dinf, r_prim, r_dual)

    it0 = jnp.asarray(0, jnp.int32)
    done0 = jnp.asarray(False)
    zero = jnp.asarray(jnp.inf, dtype)
    state = (it0, x, z, y, rho_v, OP, done0, done0, done0, zero, zero)
    it, x, z, y, rho_v, OP, done, pinf, dinf, r_prim, r_dual = jax.lax.while_loop(
        cond_fn, body_fn, state
    )

    if st.polish and m:
        x, y, z, r_prim, r_dual = _polish(
            Pb, qb, Ab, lb, ub, x, y, z, r_prim, r_dual, residuals, st, dtype
        )

    # Unscale: x = D xbar, y = E ybar / c, z = zbar / E.
    return QPSolution(
        x=D * x,
        y=E * y / c,
        z=z / E,
        iters=it,
        converged=done,
        r_prim=r_prim,
        r_dual=r_dual,
        prim_inf=pinf,
        dual_inf=dinf,
    )


def _polish(Pb, qb, Ab, lb, ub, x, y, z, r_prim, r_dual, residuals, st, dtype):
    """OSQP solution polishing (masked active-set KKT re-solve).

    Active rows are those where the ADMM iterate sits on a bound with the
    matching dual sign (OSQP ``polish.c`` semantics).  The KKT system is
    formed with a row mask S so the shape stays static under jit::

        [[P + dI,  (S A)^T], [S A,  S - I - dI]] [x; nu] = [-q; S b]

    giving ``A_i x = b_i`` on active rows and ``nu_i = 0`` on inactive ones.
    One iterative-refinement step against the unregularized system follows;
    the polished point is accepted only if it improves both residuals.
    """
    n = Pb.shape[0]
    m = Ab.shape[0]
    delta = jnp.asarray(st.polish_delta, dtype)
    lower_active = y < 0.0
    upper_active = y > 0.0
    active = jnp.logical_or(lower_active, upper_active)
    b_act = jnp.where(upper_active, ub, jnp.where(lower_active, lb, 0.0))
    S = active.astype(dtype)

    SA = S[:, None] * Ab
    K = jnp.zeros((n + m, n + m), dtype)
    K = K.at[:n, :n].set(Pb + delta * jnp.eye(n, dtype=dtype))
    K = K.at[:n, n:].set(SA.T)
    K = K.at[n:, :n].set(SA)
    K = K.at[n:, n:].set(jnp.diag(S - 1.0 - delta))
    rhs = jnp.concatenate([-qb, S * b_act])
    Kinv = jnp.linalg.inv(K)
    sol = Kinv @ rhs
    # One iterative-refinement step vs the unregularized KKT operator.
    K0 = K - delta * jnp.diag(
        jnp.concatenate([jnp.ones((n,), dtype), jnp.ones((m,), dtype)])
    )
    sol = sol + Kinv @ (rhs - K0 @ sol)

    x_p = sol[:n]
    nu = sol[n:]
    y_p = jnp.where(active, nu, 0.0)
    z_p = jnp.clip(Ab @ x_p, lb, ub)
    rp_p, rd_p, _, _, _, _ = residuals(x_p, z_p, y_p)
    better = jnp.logical_and(rp_p <= r_prim, rd_p <= r_dual)
    pick = lambda a, b: jnp.where(better, a, b)
    return (
        pick(x_p, x),
        pick(y_p, y),
        pick(z_p, z),
        pick(rp_p, r_prim),
        pick(rd_p, r_dual),
    )
