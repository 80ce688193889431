"""SQP engine — the TPU-native replacement for the reference's core IP,
``SQPOptimizationSolver`` (``/root/reference/src/sqp_solver/SQPOptimizationSolver.{h,cpp}``)
and its ``AutoDifferentiator`` helper
(``/root/reference/src/sqp_solver/AutoDifferentiator.cpp``).

Replicated semantics (see SURVEY.md section 3.2):

* **Augmented-variable formulation** (``SQPOptimizationSolver.cpp:50-55``):
  the QP decision vector is ``dz = [dp; dx]`` and the linearized constraint
  stack is ``[p; x; g]`` so that identity rows pin ``dp = 0`` and impose the
  box bounds on ``x`` as general linear constraints.
* The Hessian is the **exact Hessian of the objective only** — not of the
  Lagrangian (``SQPOptimizationSolver.cpp:58``): a Newton-on-objective SQP.
* Linearized bounds ``l_lin = l - c(z_k)``, ``u_lin = u - c(z_k)`` where
  ``c = [p; x; g]`` at the current iterate (``AutoDifferentiator.cpp:132-140``
  returns ``-F(point)``; ``SQPOptimizationSolver.cpp:70-71``).
* Damped update ``x += alpha * dz[n_p:]`` with fixed ``alpha`` and a fixed
  iteration count ``step_num`` (``SQPOptimizationSolver.cpp:167-177``; in
  non-verbose mode the reference always runs all iterations,
  ``cpp:189-196``).
* Warm start across calls: the solver's ``result_`` persists and the next
  call continues from it; the incoming ``arg["x0"]`` is **ignored** by this
  backend, exactly like the reference (``cpp:100-120`` uses
  ``result_.at("x")``, initialized to zeros at ``cpp:88-91``).

TPU-native differences: CasADi symbolic AD + codegen becomes ``jax.grad`` /
``jax.hessian`` / ``jax.jacfwd`` on traced pure functions; the entire SQP loop
(including every inner ADMM solve) is ONE jitted XLA program — where the
reference re-assembles matrices on the CPU and re-initializes OSQP with a
host->device upload on every iteration (``cpp:137-198``), we stay on device
for the full solve, and ``jax.vmap`` batches thousands of independent solves.

Also provided (beyond the reference): a ``reduced`` formulation that
eliminates the pinned ``dp`` rows from the QP. It is mathematically
equivalent (with ``dp = 0`` enforced exactly rather than to QP tolerance)
and substantially cheaper when the reference signal is long.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..sym import Sym
from .admm import ADMMSettings, admm_solve, f32_matmuls

__all__ = ["SQPOptions", "SQPResult", "SQPOptimizationSolver", "normalize_nlp"]


class SQPResult(NamedTuple):
    x: jnp.ndarray  # final iterate (n_x,)
    f: jnp.ndarray  # objective at final iterate (scalar)
    qp_x: jnp.ndarray  # last QP primal (for warm starting)
    qp_y: jnp.ndarray  # last QP dual
    f_history: jnp.ndarray  # objective after each SQP iteration (step_num,)
    qp_iters: jnp.ndarray  # ADMM iterations per SQP step (step_num,)
    step_norms: jnp.ndarray  # ||alpha*dx|| per SQP step (step_num,)
    # Per-step QP status flags (step_num,) bool.  A True in qp_prim_inf /
    # qp_dual_inf means that step's local QP was certified infeasible /
    # unbounded (OSQP certificates) — the damped update still applied its
    # (truncated) direction, matching the reference's use-the-result-anyway
    # behavior, but callers can see it.  Default-empty for paths that
    # predate the flags (batched shared-system).
    qp_converged: jnp.ndarray = np.zeros((0,), bool)  # noqa: RUF009
    qp_prim_inf: jnp.ndarray = np.zeros((0,), bool)  # noqa: RUF009
    qp_dual_inf: jnp.ndarray = np.zeros((0,), bool)  # noqa: RUF009
    # SQP iterations actually applied (< max_iter when the ||alpha*dx|| <
    # early_exit_tol break fired, SQPOptimizationSolver.cpp:189-196).
    steps_taken: jnp.ndarray = np.zeros((), np.int32)  # noqa: RUF009


try:  # allow jax.export artifacts containing SQPResult (serialization.py)
    from jax import export as _jax_export

    _jax_export.register_namedtuple_serialization(
        SQPResult, serialized_name="ocp_tpu.SQPResult"
    )
except Exception:  # pragma: no cover - older jax without the helper
    pass


import dataclasses


@dataclasses.dataclass(frozen=True)
class SQPOptions:
    """Options mirroring the reference's ctor dict
    (``SQPOptimizationSolver.cpp:12-17``: ``max_iter``, ``alpha``,
    ``verbose``) plus TPU-specific extensions."""

    max_iter: int = 10  # step_num / "ADMM_step" in readme.md:61
    alpha: float = 0.1  # "SQP_step" in readme.md:60
    verbose: bool = False
    formulation: str = "augmented"  # "augmented" (parity) | "reduced" (fast)
    qp_warm_start: bool = True
    dtype: Any = jnp.float32
    admm: ADMMSettings = ADMMSettings()
    # Shared-system (LTI/LQ) fast path: one QP factorization shared by the
    # whole batch, ADMM iterations as batch-wide GEMMs (admm_batched.py).
    # None = auto-detect by probing whether (H, A) depend on (x, p).
    shared_system: Optional[bool] = None
    # Hessian convexification.  The reference uses the raw objective Hessian
    # (SQPOptimizationSolver.cpp:58), which for nonlinear costs can be
    # indefinite along unbounded directions -> unbounded QP -> divergence
    # (OSQP would report dual infeasibility; the reference uses the result
    # regardless).  "auto" = Gershgorin-bound shift (fast, conservative);
    # "eigh" = exact minimum-eigenvalue shift; a float adds a fixed
    # multiple of identity; 0.0 reproduces the reference exactly.
    hessian_reg: Any = "auto"
    # Step-size rule.  "none" = the reference's fixed damped step
    # x += alpha*dx (SQPOptimizationSolver.cpp:174-177).  "merit" =
    # candidate line search on the L1 exact-penalty merit
    # phi(x) = f(x) + mu*||violation||_1: evaluate ls_num geometric
    # candidates a_k = ls_alpha_max * 2^-k in one vmap (static shapes, no
    # sequential backtracking) and take the best.  Opt-in extension beyond
    # the reference; typically allows far fewer SQP iterations on
    # nonlinear problems than a small fixed alpha.
    line_search: str = "none"
    ls_num: int = 8
    ls_alpha_max: float = 1.0
    ls_merit_mu: float = 10.0
    # Convergence early-exit on ||alpha*dx|| < early_exit_tol
    # (SQPOptimizationSolver.cpp:189-196).  The reference checks this ONLY
    # when verbose; ``None`` reproduces that quirk (exit iff verbose), while
    # True/False force it on/off regardless of verbosity.  Inside the fixed-
    # length scan, "exit" means the iterate freezes: later iterations leave
    # x/qp state untouched and report qp_iters=0 — bit-identical results to
    # the reference's ``break``.
    early_exit: Optional[bool] = None
    early_exit_tol: float = 1e-6

    @classmethod
    def parity(cls, **overrides) -> "SQPOptions":
        """Reference-parity preset: the exact semantics of
        ``SQPOptimizationSolver::getOptimalSolution`` (cpp:127-216).

        Augmented z=[p;x] formulation, raw objective Hessian (reg 0.0,
        cpp:58), fixed damped step alpha=0.1 x step_num=10 with no line
        search, early exit off (non-verbose reference behavior), the
        per-scenario QP path (no shared-factorization shortcut), and
        COLD-started QPs: the reference calls ``initSolver()`` afresh every
        SQP iteration (``CuCaQP.cpp:183-197`` clears and re-creates the OSQP
        workspace), so its ``warm_start`` setting never actually carries
        primal/dual state between iterations.  Override any field by
        keyword, e.g. ``SQPOptions.parity(verbose=True)``.
        """
        base = dict(
            formulation="augmented",
            hessian_reg=0.0,
            line_search="none",
            alpha=0.1,
            max_iter=10,
            shared_system=False,
            qp_warm_start=False,
        )
        base.update(overrides)
        return cls(**base)


def _host_eval(fn, *args):
    """Evaluate a small construction-time probe, preferring a CPU device.

    Solver construction needs a handful of tiny jitted evaluations (LTI
    detection, shared-matrix extraction).  On accelerators behind a slow
    remote-compile service these one-off compiles dominate construction
    time; a CPU device (if registered, e.g. ``jax_platforms="tpu,cpu"``)
    compiles them in milliseconds.  Falls back to the default device.
    """
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except Exception:
        return jax.jit(fn)(*args)
    with jax.default_device(cpu):
        return jax.jit(fn)(*args)


def normalize_nlp(nlp: Dict[str, Any]):
    """Accept the reference-shaped nlp dict and normalize to callables.

    ``nlp`` keys (mirroring the CasADi ``SXDict`` at
    ``OptimalControlProblem.cpp:235-240``):

    * ``"x"``: decision variables — a leaf :class:`Sym` or an int size.
    * ``"f"``: objective — a scalar :class:`Sym` or callable ``f(x, p)``.
    * ``"g"``: constraints — :class:`Sym`, callable, or absent/None.
    * ``"p"``: parameters — leaf :class:`Sym`, int size, or absent/None.

    Returns ``(f_fn, g_fn, n_x, n_p, n_g)`` with ``f_fn(x, p) -> scalar`` and
    ``g_fn(x, p) -> (n_g,)`` (``g_fn`` is None when there are no constraints).
    """
    if "x" not in nlp:
        raise ValueError("optimization variable 'x' not defined")  # cpp:25-27
    if "f" not in nlp:
        raise ValueError("objective 'f' not defined")  # cpp:20-22

    xspec = nlp["x"]
    pspec = nlp.get("p", None)
    if isinstance(xspec, Sym):
        n_x = xspec.size1()
        x_name = xspec.name
        if x_name is None:
            raise ValueError("'x' must be a leaf symbol")
    else:
        n_x = int(xspec)
        x_name = None

    if pspec is None:
        n_p, p_name = 0, None
    elif isinstance(pspec, Sym):
        n_p, p_name = pspec.size1(), pspec.name
    else:
        n_p, p_name = int(pspec), None

    def wrap(expr_or_fn, out_scalar):
        if expr_or_fn is None:
            return None, 0
        if isinstance(expr_or_fn, Sym):
            if x_name is None:
                raise ValueError(
                    "Sym expressions require 'x' to be a leaf symbol"
                )
            names = [x_name] + ([p_name] if p_name else [])
            size = expr_or_fn.size1()

            def fn(x, p):
                env = {x_name: x}
                if p_name:
                    env[p_name] = p
                from ..sym import evaluate

                out = evaluate(expr_or_fn, env)
                return out[0] if out_scalar else out

            return fn, size
        fn_raw = expr_or_fn

        def fn(x, p):
            out = jnp.asarray(fn_raw(x, p))
            if out_scalar:
                return out.reshape(())
            return out.reshape(-1)

        return fn, None

    f_fn, _ = wrap(nlp["f"], out_scalar=True)
    gspec = nlp.get("g", None)
    if isinstance(gspec, Sym) and gspec.size1() == 0:
        gspec = None
    g_fn, n_g = wrap(gspec, out_scalar=False)
    if g_fn is not None and n_g is None:
        # Callable constraints: probe the output size by tracing.
        n_g = int(
            jax.eval_shape(
                g_fn, jnp.zeros((n_x,)), jnp.zeros((n_p,))
            ).shape[0]
        )
    if g_fn is None:
        n_g = 0
    return f_fn, g_fn, n_x, n_p, n_g


def build_local_system_parts(
    f_fn: Callable,
    g_fn: Optional[Callable],
    n_x: int,
    n_p: int,
    n_g: int,
    formulation: str,
    dtype,
    hessian_reg="auto",
):
    """Composable pieces of the local-QP assembly.

    Returns ``(matrices, matrices_raw, vectors, stack_bounds)``:

    * ``matrices(x, p) -> (H, A)`` — regularized objective Hessian and the
      linearized constraint-stack Jacobian;
    * ``matrices_raw(x, p) -> (H, A)`` — same without Hessian
      regularization (no eigendecomposition in the traced graph; used for
      shared-system detection/extraction, where the shift is applied on the
      host instead);
    * ``vectors(x, p) -> (grad, cval)`` — objective gradient and the value of
      the constraint stack ``c`` at the point;
    * ``stack_bounds(x, p, lbx, ubx, lbg, ubg) -> (lower, upper)`` — the raw
      (un-shifted) bound stack.

    Split out so the shared-system (LTI) batched path can compute ``(H, A)``
    once while vmapping only the per-scenario vectors.
    """
    if formulation not in ("augmented", "reduced"):
        raise ValueError(f"unknown formulation {formulation!r}")
    augmented = formulation == "augmented"

    def _regularize(H):
        """Convexify an indefinite objective Hessian (SQPOptions.hessian_reg).

        Prevents unbounded local QPs for nonconvex costs (which the
        reference's raw Hessian produces, SQPOptimizationSolver.cpp:58).

        "auto" (default) uses a Gershgorin lower bound on the minimum
        eigenvalue — O(n^2) elementwise work, no eigendecomposition in the
        hot path (batched eigh is a multi-ms custom call on TPU and was the
        dominant cost of nonlinear solves).  Conservative: may shift
        PSD-but-not-diagonally-dominant Hessians slightly, which only damps
        the (already damped) SQP step.  "eigh" shifts by the exact minimum
        eigenvalue; a float adds a fixed multiple of identity; 0.0
        reproduces the reference exactly."""
        if hessian_reg == "auto":
            Hs = 0.5 * (H + H.T)
            diag = jnp.diagonal(Hs)
            offsum = jnp.sum(jnp.abs(Hs), axis=1) - jnp.abs(diag)
            bound = jnp.min(diag - offsum)  # Gershgorin: lambda_min >= bound
            shift = jnp.maximum(jnp.asarray(0.0, H.dtype), 1e-6 - bound)
            return H + shift * jnp.eye(H.shape[0], dtype=H.dtype)
        if hessian_reg == "eigh":
            w_min = jnp.linalg.eigvalsh(0.5 * (H + H.T))[0]
            shift = jnp.maximum(jnp.asarray(0.0, H.dtype), 1e-6 - w_min)
            return H + shift * jnp.eye(H.shape[0], dtype=H.dtype)
        reg = float(hessian_reg)
        if reg > 0.0:
            return H + reg * jnp.eye(H.shape[0], dtype=H.dtype)
        return H

    if augmented:
        nz = n_p + n_x

        def f_z(z):
            return f_fn(z[n_p:], z[:n_p])

        def c_z(z):
            if g_fn is None:
                return z
            return jnp.concatenate([z, g_fn(z[n_p:], z[:n_p])])

        def matrices_raw(x, p):
            z = jnp.concatenate([p, x]).astype(dtype)
            H = jax.hessian(f_z)(z)
            A = (
                jax.jacfwd(c_z)(z)
                if g_fn is not None
                else jnp.eye(nz, dtype=dtype)
            )
            return H, A

        def matrices(x, p):
            H, A = matrices_raw(x, p)
            return _regularize(H), A

        def vectors(x, p):
            z = jnp.concatenate([p, x]).astype(dtype)
            return jax.grad(f_z)(z), c_z(z)

        def stack_bounds(p, lbx, ubx, lbg, ubg):
            lower = jnp.concatenate([p, lbx, lbg]).astype(dtype)
            upper = jnp.concatenate([p, ubx, ubg]).astype(dtype)
            return lower, upper

    else:

        def matrices_raw(x, p):
            x = x.astype(dtype)
            H = jax.hessian(lambda xx: f_fn(xx, p))(x)
            if g_fn is not None:
                J = jax.jacfwd(lambda xx: g_fn(xx, p))(x)
                A = jnp.concatenate([jnp.eye(n_x, dtype=dtype), J], axis=0)
            else:
                A = jnp.eye(n_x, dtype=dtype)
            return H, A

        def matrices(x, p):
            H, A = matrices_raw(x, p)
            return _regularize(H), A

        def vectors(x, p):
            x = x.astype(dtype)
            grad = jax.grad(lambda xx: f_fn(xx, p))(x)
            if g_fn is not None:
                cval = jnp.concatenate([x, g_fn(x, p)])
            else:
                cval = x
            return grad, cval

        def stack_bounds(p, lbx, ubx, lbg, ubg):
            lower = jnp.concatenate([lbx, lbg]).astype(dtype)
            upper = jnp.concatenate([ubx, ubg]).astype(dtype)
            return lower, upper

    return matrices, matrices_raw, vectors, stack_bounds


def build_local_system_fn(
    f_fn: Callable,
    g_fn: Optional[Callable],
    n_x: int,
    n_p: int,
    n_g: int,
    formulation: str,
    dtype,
    hessian_reg="auto",
):
    """Build the local-QP assembly — the analog of the reference's
    ``localSystemFunction_`` (``SQPOptimizationSolver.cpp:74-77``): maps
    ``(x, p, lbx, ubx, lbg, ubg) -> (H, grad, A, l_lin, u_lin)`` with
    ``l_lin = l - c(z)`` (``AutoDifferentiator.cpp:132-140``).

    All derivatives come from JAX tracing (replacing ``AutoDifferentiator``'s
    CasADi hessian/gradient/jacobian, ``AutoDifferentiator.cpp:16-28``).
    """
    matrices, _matrices_raw, vectors, stack_bounds = build_local_system_parts(
        f_fn, g_fn, n_x, n_p, n_g, formulation, dtype, hessian_reg
    )

    def local_system(x, p, lbx, ubx, lbg, ubg):
        H, A = matrices(x, p)
        grad, cval = vectors(x, p)
        lower, upper = stack_bounds(p, lbx, ubx, lbg, ubg)
        return H, grad, A, lower - cval, upper - cval

    return local_system


class SQPOptimizationSolver:
    """Stateful solver with reference-parity API, wrapping one jitted solve.

    The raw jitted functional core is exposed as :attr:`solve_fn` for
    composition with ``vmap`` / ``shard_map`` (batched scenario MPC).
    """

    def __init__(
        self,
        nlp: Dict[str, Any],
        options: Optional[Dict | SQPOptions] = None,
        local_system_parts=None,
        stage_structure=None,
    ):
        if options is None:
            options = SQPOptions()
        elif isinstance(options, dict):
            # Reference option names: max_iter (= step count), alpha, verbose
            # (SQPOptimizationSolver.cpp:14-17).
            known = {f.name for f in dataclasses.fields(SQPOptions)}
            opts = {k: v for k, v in options.items() if k in known}
            options = SQPOptions(**opts)
        self.options = options
        self.f_fn, self.g_fn, self.n_x, self.n_p, self.n_g = normalize_nlp(nlp)
        self.dtype = options.dtype
        self._verbose = options.verbose

        if local_system_parts is not None:
            # Structured override (e.g. stagewise.py): caller supplies the
            # (matrices, matrices_raw, vectors, stack_bounds) tuple.
            if options.formulation != "reduced":
                raise ValueError(
                    "custom local_system_parts require formulation='reduced'"
                )
            self._parts = local_system_parts
        else:
            self._parts = build_local_system_parts(
                self.f_fn,
                self.g_fn,
                self.n_x,
                self.n_p,
                self.n_g,
                options.formulation,
                self.dtype,
                options.hessian_reg,
            )
        matrices, matrices_raw, vectors, stack_bounds = self._parts

        def local_system(x, p, lbx, ubx, lbg, ubg):
            H, A = matrices(x, p)
            grad, cval = vectors(x, p)
            lower, upper = stack_bounds(p, lbx, ubx, lbg, ubg)
            return H, grad, A, lower - cval, upper - cval

        self.local_system = local_system
        aug = options.formulation == "augmented"
        self._qp_n = (self.n_p + self.n_x) if aug else self.n_x
        self._qp_m = self._qp_n + self.n_g

        self.stage_structure = stage_structure
        if options.admm.method == "banded" and stage_structure is None:
            raise ValueError(
                "ADMM method 'banded' requires a stage structure "
                "(OptimalControlProblem.set_stage_structure)"
            )

        if options.line_search != "none":
            # The shared-factorization batched path implements the fixed
            # reference update only; merit line search runs per-scenario.
            self.shared_system = False
        elif options.shared_system is None and options.admm.method != "banded":
            self.shared_system = self._detect_shared_system()
        else:
            self.shared_system = bool(options.shared_system or False)

        if options.admm.method == "banded":
            self.solve_fn = self._build_solve_banded_fn()
        else:
            self.solve_fn = self._build_solve_fn()
        self.solve_batch_fn = (
            self._build_solve_batch_fn() if self.shared_system else None
        )
        # Batch-native banded path: the whole scenario batch iterates inside
        # the fused batch-last Pallas chunk (admm_banded_batch.py) instead of
        # a vmapped per-scenario XLA loop.  BatchedSolver prefers this for
        # stage-structured problems.
        self.solve_batch_banded_fn = (
            self._build_solve_banded_batch_fn()
            if options.admm.method == "banded"
            else None
        )

        # Persistent warm-start state, analog of ``result_``
        # (SQPOptimizationSolver.cpp:88-91): starts at zeros.
        self._result_x = jnp.zeros((self.n_x,), self.dtype)
        self._result_f = jnp.zeros((), self.dtype)
        self._qp_x = jnp.zeros((self._qp_n,), self.dtype)
        self._qp_y = jnp.zeros((self._qp_m,), self.dtype)

    # -- shared-system (LTI) detection ------------------------------------
    def _detect_shared_system(self) -> bool:
        """Probe whether (H, A) are independent of the evaluation point.

        True for LQ/LTI problems (quadratic costs, linear dynamics), which
        unlocks the shared-factorization batched ADMM (admm_batched.py).
        Probing evaluates the traced matrices at two random points — exact
        for the polynomial expressions produced by tracing.
        """
        matrices_raw = self._parts[1]
        rng = np.random.default_rng(12345)
        try:
            outs = []
            for _ in range(2):
                x = jnp.asarray(
                    rng.normal(size=(self.n_x,)) * 0.7, self.dtype
                )
                p = jnp.asarray(
                    rng.normal(size=(self.n_p,)) * 0.7, self.dtype
                )
                outs.append(_host_eval(matrices_raw, x, p))
            (H1, A1), (H2, A2) = outs
            return bool(
                jnp.allclose(H1, H2, rtol=1e-4, atol=1e-5)
                and jnp.allclose(A1, A2, rtol=1e-4, atol=1e-5)
            )
        except Exception:  # pragma: no cover - conservative fallback
            return False

    def _early_exit(self):
        """Resolve the early-exit policy to a static (enabled, tol) pair.

        The reference checks ||alpha*dx|| < 1e-6 only when verbose
        (SQPOptimizationSolver.cpp:189-196); ``early_exit=None`` reproduces
        that tie, True/False override it.
        """
        opt = self.options
        enabled = opt.verbose if opt.early_exit is None else bool(opt.early_exit)
        return enabled, float(opt.early_exit_tol)

    # -- step-size rule ----------------------------------------------------
    def _make_step_rule(self):
        """Return ``step(x, dx, p, lbx, ubx, lbg, ubg) -> (x_new, norm)``.

        "none" reproduces the reference's fixed damped update
        (SQPOptimizationSolver.cpp:174-177); "merit" evaluates ls_num
        geometric step candidates against an L1 exact-penalty merit in one
        vmap and takes the best — static shapes, no data-dependent
        control flow, so it jits/vmaps cleanly.
        """
        opt = self.options
        f_fn, g_fn, n_g = self.f_fn, self.g_fn, self.n_g
        if opt.line_search == "none":
            alpha = opt.alpha

            def step(x, dx, p, lbx, ubx, lbg, ubg):
                return x + alpha * dx, jnp.linalg.norm(alpha * dx)

            return step
        if opt.line_search != "merit":
            raise ValueError(
                f"unknown line_search: {opt.line_search!r} (use 'none' or 'merit')"
            )
        mu = opt.ls_merit_mu
        alphas = opt.ls_alpha_max * (0.5 ** np.arange(opt.ls_num))

        def step(x, dx, p, lbx, ubx, lbg, ubg):
            al = jnp.asarray(alphas, x.dtype)
            cand = x[None, :] + al[:, None] * dx[None, :]

            def merit(xc):
                fv = f_fn(xc, p)
                # max(-inf, 0) = 0, so infinite bounds contribute nothing.
                viol = jnp.sum(
                    jnp.maximum(lbx - xc, 0.0) + jnp.maximum(xc - ubx, 0.0)
                )
                if n_g:
                    gv = g_fn(xc, p)
                    viol = viol + jnp.sum(
                        jnp.maximum(lbg - gv, 0.0) + jnp.maximum(gv - ubg, 0.0)
                    )
                return fv + mu * viol

            merits = jax.vmap(merit)(cand)
            a = al[jnp.argmin(merits)]
            return x + a * dx, jnp.linalg.norm(a * dx)

        return step

    # -- functional core --------------------------------------------------
    def _build_solve_fn(self):
        opt = self.options
        n_p = self.n_p
        aug = opt.formulation == "augmented"
        local_system = self.local_system
        f_fn = self.f_fn
        admm_settings = opt.admm
        early, tol = self._early_exit()

        step_rule = self._make_step_rule()

        @f32_matmuls
        def solve(x_init, p, lbx, ubx, lbg, ubg, qp_x0, qp_y0):
            x_init = x_init.astype(opt.dtype)
            p = p.astype(opt.dtype)

            def sqp_iter(carry, _):
                x, qpx, qpy, stop = carry
                H, grad, A, low, up = local_system(x, p, lbx, ubx, lbg, ubg)
                sol = admm_solve(
                    H,
                    grad,
                    A,
                    low,
                    up,
                    admm_settings,
                    x0=qpx if opt.qp_warm_start else None,
                    y0=qpy if opt.qp_warm_start else None,
                )
                dx = sol.x[n_p:] if aug else sol.x
                x_new, step_norm = step_rule(x, dx, p, lbx, ubx, lbg, ubg)
                if early:
                    # Frozen after the ||alpha*dx|| < tol break: identical
                    # results to the reference's loop `break` (cpp:189-196)
                    # inside a fixed-length scan.
                    x_new = jnp.where(stop, x, x_new)
                    qpx_n = jnp.where(stop, qpx, sol.x)
                    qpy_n = jnp.where(stop, qpy, sol.y)
                    qp_it = jnp.where(stop, 0, sol.iters)
                    step_norm = jnp.where(stop, 0.0, step_norm)
                    took = jnp.logical_not(stop)
                    stop = jnp.logical_or(stop, step_norm < tol)
                else:
                    qpx_n, qpy_n, qp_it = sol.x, sol.y, sol.iters
                    took = jnp.asarray(True)
                fval = f_fn(x_new, p)
                status = (
                    jnp.asarray(sol.converged),
                    jnp.asarray(sol.prim_inf),
                    jnp.asarray(sol.dual_inf),
                )
                return (x_new, qpx_n, qpy_n, stop), (
                    fval, qp_it, step_norm, status, took
                )

            (x, qpx, qpy, _), (f_hist, qp_iters, step_norms, status, took) = (
                jax.lax.scan(
                    sqp_iter,
                    (x_init, qp_x0, qp_y0, jnp.asarray(False)),
                    None,
                    length=opt.max_iter,
                )
            )
            return SQPResult(
                x=x,
                f=f_hist[-1],
                qp_x=qpx,
                qp_y=qpy,
                f_history=f_hist,
                qp_iters=qp_iters,
                step_norms=step_norms,
                qp_converged=status[0],
                qp_prim_inf=status[1],
                qp_dual_inf=status[2],
                steps_taken=jnp.sum(took.astype(jnp.int32)),
            )

        return jax.jit(solve)

    def _build_solve_banded_fn(self):
        """Single-scenario solve using the block-tridiagonal ADMM
        (solvers/admm_banded.py) — no dense operators; vmap for batching.
        """
        from ..stagewise import build_stage_blocks
        from .admm_banded import BandedQP, admm_solve_banded

        opt = self.options
        ss = self.stage_structure
        f_fn = self.f_fn
        admm_settings = opt.admm
        dtype = opt.dtype
        _, _, vectors, stack_bounds = self._parts
        blocks = build_stage_blocks(ss, dtype, opt.hessian_reg)
        step_rule = self._make_step_rule()
        early, tol = self._early_exit()

        def solve(x_init, p, lbx, ubx, lbg, ubg, qp_x0, qp_y0):
            x_init = x_init.astype(dtype)
            p = p.astype(dtype)
            # Iterate-independent: hoisted out of the SQP scan.
            lower, upper = stack_bounds(p, lbx, ubx, lbg, ubg)

            def sqp_iter(carry, _):
                x, qpx, qpy, stop = carry
                Hb, J0, J1, Jc = blocks(x, p)
                grad, cval = vectors(x, p)
                qp = BandedQP(
                    Hb=Hb,
                    J0=J0,
                    J1=J1,
                    Jc=Jc,
                    q=grad,
                    l=lower - cval,
                    u=upper - cval,
                )
                sol = admm_solve_banded(
                    qp,
                    admm_settings,
                    x0=qpx if opt.qp_warm_start else None,
                    y0=qpy if opt.qp_warm_start else None,
                )
                x_new, step_norm = step_rule(x, sol.x, p, lbx, ubx, lbg, ubg)
                if early:
                    x_new = jnp.where(stop, x, x_new)
                    qpx_n = jnp.where(stop, qpx, sol.x)
                    qpy_n = jnp.where(stop, qpy, sol.y)
                    qp_it = jnp.where(stop, 0, sol.iters)
                    step_norm = jnp.where(stop, 0.0, step_norm)
                    took = jnp.logical_not(stop)
                    stop = jnp.logical_or(stop, step_norm < tol)
                else:
                    qpx_n, qpy_n, qp_it = sol.x, sol.y, sol.iters
                    took = jnp.asarray(True)
                fval = f_fn(x_new, p)
                status = (
                    jnp.asarray(sol.converged),
                    jnp.asarray(sol.prim_inf),
                    jnp.asarray(sol.dual_inf),
                )
                return (x_new, qpx_n, qpy_n, stop), (
                    fval, qp_it, step_norm, status, took
                )

            (x, qpx, qpy, _), (f_hist, qp_iters, step_norms, status, took) = (
                jax.lax.scan(
                    sqp_iter,
                    (x_init, qp_x0, qp_y0, jnp.asarray(False)),
                    None,
                    length=opt.max_iter,
                )
            )
            return SQPResult(
                x=x,
                f=f_hist[-1],
                qp_x=qpx,
                qp_y=qpy,
                f_history=f_hist,
                qp_iters=qp_iters,
                step_norms=step_norms,
                qp_converged=status[0],
                qp_prim_inf=status[1],
                qp_dual_inf=status[2],
                steps_taken=jnp.sum(took.astype(jnp.int32)),
            )

        return jax.jit(solve)

    def _build_solve_banded_batch_fn(self):
        """Batched banded solve: one fused Pallas chunk per rho interval
        for the WHOLE scenario batch (solvers/admm_banded_batch.py).

        Same signature as ``solve_batch_fn``: ``(x (B,nx), p (B,np),
        lbx (B,nx), ubx, lbg (B,ng), ubg, qp_x (B,qn), qp_y (B,qm)) ->
        SQPResult`` with leading batch dims.  Unlike the shared-system GEMM
        path this handles NONLINEAR models (per-scenario operators rebuilt
        each SQP step) and populates per-step QP status flags and
        infeasibility certificates for every scenario.  Falls back to the
        vmapped XLA loop automatically when the kernel working set exceeds
        VMEM (pick_batch_tile -> None), with identical semantics.
        """
        from ..stagewise import (
            build_stage_blocks_batch,
            build_stage_vectors_batch,
        )
        from .admm_banded import BandedQP
        from .admm_banded_batch import (
            admm_solve_banded_batch_T,
            ruiz_scalings_batch_T,
        )

        opt = self.options
        ss = self.stage_structure
        admm_settings = opt.admm
        dtype = opt.dtype
        _, _, _, stack_bounds = self._parts
        # Batch-LAST derivative/vector evaluation: the scenario batch fills
        # the TPU lanes, so each trig/chain-rule op runs once per stage
        # across the whole batch instead of once per scenario row with
        # w-of-128 lanes used (stagewise.py, round-4 derivative-layer fix).
        blocks_T = build_stage_blocks_batch(ss, dtype, opt.hessian_reg)
        vectors_T = build_stage_vectors_batch(ss, dtype)
        bounds_b = jax.vmap(stack_bounds)
        f_b = jax.vmap(self.f_fn)
        step_b = jax.vmap(self._make_step_rule())
        early, tol = self._early_exit()

        @f32_matmuls
        def solve_batch(x_init, p, lbx, ubx, lbg, ubg, qp_x0, qp_y0):
            x_init = x_init.astype(dtype)
            p = p.astype(dtype)
            # Iterate-independent: hoisted out of the SQP scan (only the
            # shift by c(x_k) changes per iteration).
            lower, upper = bounds_b(p, lbx, ubx, lbg, ubg)
            lowerT, upperT = lower.T, upper.T
            pT = p.T

            def build_qp_T(x):
                # Batch-LAST end to end: the derivative layer already
                # produces trailing-scenario-axis blocks; handing them to
                # the batch-last driver directly (admm_solve_banded_batch_T)
                # removes the per-SQP-step batch-leading round trip (~30
                # relayout ops/step — the dominant prepare cost measured at
                # cart-pole h20 B=256, docs/PERFORMANCE.md round 5).
                HbT, J0T, J1T, JcT = blocks_T(x.T, pT)
                gradT, cvalT = vectors_T(x.T, pT)
                return BandedQP(
                    Hb=HbT, J0=J0T, J1=J1T, Jc=JcT,
                    q=gradT, l=lowerT - cvalT, u=upperT - cvalT,
                )

            if admm_settings.scaling_refresh == "tick":
                # Hoist Ruiz out of the SQP scan: equilibrate ONCE against
                # the first linearization and reuse the factors for every
                # step's QP (see ADMMSettings.scaling_refresh).
                scalingsT = ruiz_scalings_batch_T(
                    build_qp_T(x_init), admm_settings.scaling_iters
                )
            else:
                scalingsT = None

            def sqp_iter(carry, _):
                x, qpxT, qpyT, stop = carry
                qpT = build_qp_T(x)
                (sxT, syT, szT, s_iters, s_conv, s_rp, s_rd,
                 s_pinf, s_dinf) = admm_solve_banded_batch_T(
                    qpT,
                    admm_settings,
                    x0T=qpxT if opt.qp_warm_start else None,
                    y0T=qpyT if opt.qp_warm_start else None,
                    scalingsT=scalingsT,
                )
                sol_x = sxT.T  # (B, n) for the (batch-leading) step rule
                x_new, step_norm = step_b(x, sol_x, p, lbx, ubx, lbg, ubg)
                if early:
                    keep = stop[:, None]
                    keepT = stop[None, :]
                    x_new = jnp.where(keep, x, x_new)
                    qpx_n = jnp.where(keepT, qpxT, sxT)
                    qpy_n = jnp.where(keepT, qpyT, syT)
                    qp_it = jnp.where(stop, 0, s_iters)
                    step_norm = jnp.where(stop, 0.0, step_norm)
                    took = jnp.logical_not(stop)
                    stop = jnp.logical_or(stop, step_norm < tol)
                else:
                    qpx_n, qpy_n, qp_it = sxT, syT, s_iters
                    took = jnp.ones(step_norm.shape, bool)
                fval = f_b(x_new, p)
                status = (s_conv, s_pinf, s_dinf)
                return (x_new, qpx_n, qpy_n, stop), (
                    fval, qp_it, step_norm, status, took
                )

            stop0 = jnp.zeros((x_init.shape[0],), bool)
            (x, qpxT, qpyT, _), (f_hist, qp_iters, step_norms, status, took) = (
                jax.lax.scan(
                    sqp_iter,
                    (x_init, qp_x0.T, qp_y0.T, stop0),
                    None,
                    length=opt.max_iter,
                )
            )
            return SQPResult(
                x=x,
                f=f_hist[-1],
                qp_x=qpxT.T,
                qp_y=qpyT.T,
                f_history=f_hist,
                qp_iters=qp_iters,
                step_norms=step_norms,
                qp_converged=status[0],
                qp_prim_inf=status[1],
                qp_dual_inf=status[2],
                steps_taken=jnp.sum(took.astype(jnp.int32), axis=0),
            )

        return jax.jit(solve_batch)

    def _build_solve_batch_fn(self):
        """Batched solve over B scenarios sharing the QP matrices.

        Signature: ``(x (B,nx), p (B,np), lbx (B,nx), ubx, lbg (B,ng),
        ubg, qp_x (B,qn), qp_y (B,qm)) -> SQPResult`` with leading batch
        dims on every field.  The SQP scan calls the shared-factorization
        GEMM ADMM (admm_batched.py) instead of a vmapped per-scenario solve.
        """
        from .admm_batched import admm_iterate_prepared, prepare_shared

        opt = self.options
        n_p = self.n_p
        aug = opt.formulation == "augmented"
        alpha = opt.alpha
        _, matrices_raw, vectors, stack_bounds = self._parts
        f_fn = self.f_fn
        admm_settings = opt.admm
        dtype = opt.dtype
        n_x = self.n_x

        # (H, A) are iterate-independent: extract them ONCE at construction
        # and apply the Hessian convexification shift on the host — keeping
        # eigendecompositions (and any per-iteration factorization) entirely
        # out of the compiled solve graph.
        H_raw, A_raw = _host_eval(
            matrices_raw, jnp.zeros((n_x,), dtype), jnp.zeros((self.n_p,), dtype)
        )
        H_np = np.asarray(H_raw, np.float64)
        A_np = np.asarray(A_raw, np.float64)
        if opt.hessian_reg == "auto":
            w_min = float(np.linalg.eigvalsh(0.5 * (H_np + H_np.T))[0])
            shift = max(0.0, 1e-6 - w_min)
        else:
            shift = float(opt.hessian_reg)
        if shift > 0.0:
            H_np = H_np + shift * np.eye(H_np.shape[0])
        H_const = jnp.asarray(H_np, dtype)
        A_const = jnp.asarray(A_np, dtype)

        vectors_b = jax.vmap(vectors)
        bounds_b = jax.vmap(stack_bounds)
        f_b = jax.vmap(f_fn)
        early, tol = self._early_exit()

        @f32_matmuls
        def solve_batch(x_init, p, lbx, ubx, lbg, ubg, qp_x0, qp_y0):
            x_init = x_init.astype(dtype)
            p = p.astype(dtype)
            # The raw bound stack is iterate-independent; only the shift by
            # c(z_k) changes per SQP iteration.  Bound TYPES (equality /
            # loose rows) are shift-invariant, so one factorization serves
            # every iteration.
            lower0, upper0 = bounds_b(p, lbx, ubx, lbg, ubg)
            grad0, _ = vectors_b(x_init, p)
            fac = prepare_shared(
                H_const, A_const, lower0, upper0, grad0, admm_settings
            )

            def sqp_iter(carry, _):
                x, qpx, qpy, stop = carry
                grad, cval = vectors_b(x, p)
                sol = admm_iterate_prepared(
                    fac,
                    grad,
                    lower0 - cval,
                    upper0 - cval,
                    admm_settings,
                    x0=qpx if opt.qp_warm_start else None,
                    y0=qpy if opt.qp_warm_start else None,
                )
                dx = sol.x[:, n_p:] if aug else sol.x
                x_new = x + alpha * dx
                step_norm = jnp.linalg.norm(alpha * dx, axis=1)
                if early:
                    # Per-scenario freeze after ||alpha*dx|| < tol — the
                    # same semantics as the per-scenario and banded-batch
                    # paths (the scenario still rides the shared batch QP,
                    # its results are simply discarded).
                    keep = stop[:, None]
                    x_new = jnp.where(keep, x, x_new)
                    qpx_n = jnp.where(keep, qpx, sol.x)
                    qpy_n = jnp.where(keep, qpy, sol.y)
                    qp_it = jnp.where(stop, 0, sol.iters)
                    step_norm = jnp.where(stop, 0.0, step_norm)
                    took = jnp.logical_not(stop)
                    stop = jnp.logical_or(stop, step_norm < tol)
                else:
                    qpx_n, qpy_n, qp_it = sol.x, sol.y, sol.iters
                    took = jnp.ones(step_norm.shape, bool)
                fval = f_b(x_new, p)
                status = (sol.converged, sol.prim_inf, sol.dual_inf)
                return (x_new, qpx_n, qpy_n, stop), (
                    fval, qp_it, step_norm, status, took
                )

            stop0 = jnp.zeros((x_init.shape[0],), bool)
            (x, qpx, qpy, _), (f_hist, qp_iters, step_norms, status, took) = (
                jax.lax.scan(
                    sqp_iter, (x_init, qp_x0, qp_y0, stop0), None,
                    length=opt.max_iter,
                )
            )
            return SQPResult(
                x=x,
                f=f_hist[-1],
                qp_x=qpx,
                qp_y=qpy,
                f_history=f_hist,
                qp_iters=qp_iters,
                step_norms=step_norms,
                qp_converged=status[0],
                qp_prim_inf=status[1],
                qp_dual_inf=status[2],
                steps_taken=jnp.sum(took.astype(jnp.int32), axis=0),
            )

        return jax.jit(solve_batch)

    # -- reference-parity stateful API ------------------------------------
    def get_optimal_solution(self, arg: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
        """Run ``step_num`` SQP iterations from the persisted iterate.

        Mirrors ``getOptimalSolution`` (``SQPOptimizationSolver.cpp:127-216``)
        including the quirk that ``arg["x0"]`` is ignored: iteration always
        continues from the internal ``result_`` state (cross-tick warm
        start).  Pass ``lbx/ubx/lbg/ubg`` and optionally ``p``.
        """
        dt = self.dtype
        lbx = jnp.asarray(arg["lbx"], dt).reshape(-1)
        ubx = jnp.asarray(arg["ubx"], dt).reshape(-1)
        p = jnp.asarray(arg.get("p", np.zeros((self.n_p,))), dt).reshape(-1)
        lbg = jnp.asarray(arg.get("lbg", np.zeros((0,))), dt).reshape(-1)
        ubg = jnp.asarray(arg.get("ubg", np.zeros((0,))), dt).reshape(-1)
        if lbx.shape[0] != self.n_x or ubx.shape[0] != self.n_x:
            raise ValueError(
                f"lbx/ubx must have size {self.n_x}, got {lbx.shape[0]}/{ubx.shape[0]}"
            )
        if lbg.shape[0] != self.n_g or ubg.shape[0] != self.n_g:
            raise ValueError(
                f"lbg/ubg must have size {self.n_g}, got {lbg.shape[0]}/{ubg.shape[0]}"
            )
        if p.shape[0] != self.n_p:
            raise ValueError(f"p must have size {self.n_p}, got {p.shape[0]}")

        res = self.solve_fn(
            self._result_x, p, lbx, ubx, lbg, ubg, self._qp_x, self._qp_y
        )
        self._result_x = res.x
        self._result_f = res.f
        self._qp_x = res.qp_x
        self._qp_y = res.qp_y
        # Full SQPResult (f_history, qp_iters, step_norms) kept for
        # programmatic observability — the reference only prints these when
        # verbose (SQPOptimizationSolver.cpp:133-213).
        self.last_result = res

        if self._verbose:
            print("=== SQP done ===")
            taken = int(np.asarray(res.steps_taken)) or self.options.max_iter
            print(f"  iterations: {taken}/{self.options.max_iter}, "
                  f"alpha: {self.options.alpha}")
            if taken < self.options.max_iter:
                # ||alpha*dx|| < tol convergence break
                # (SQPOptimizationSolver.cpp:189-196).
                print(f"  early exit: ||alpha*dx|| < {self.options.early_exit_tol}")
            print(f"  qp iters per step: {np.asarray(res.qp_iters)}")
            print(f"  f history: {np.asarray(res.f_history)}")
            print(f"  x = {np.asarray(res.x)}")
        return {"x": res.x, "f": res.f}

    def set_iterate(self, x) -> None:
        """Seed the persistent iterate (``result_``) — e.g. a shifted
        previous plan for receding-horizon warm starting (controller.py)."""
        import numpy as _np

        x = jnp.asarray(_np.asarray(x).reshape(-1), self.dtype)
        if x.shape[0] != self.n_x:
            raise ValueError(f"iterate must have size {self.n_x}")
        self._result_x = x

    def reset(self) -> None:
        """Clear the persistent iterate back to zeros (fresh ``result_``)."""
        self._result_x = jnp.zeros((self.n_x,), self.dtype)
        self._result_f = jnp.zeros((), self.dtype)
        self._qp_x = jnp.zeros((self._qp_n,), self.dtype)
        self._qp_y = jnp.zeros((self._qp_m,), self.dtype)

    def get_local_system_function(self):
        """Expose the local-QP assembly, analog of
        ``getSXLocalSystemFunction`` (``SQPOptimizationSolver.cpp:222-224``) —
        used by the serialization path (``OptimalControlProblem.cpp:404-424``);
        here serialization is simply re-tracing, so we return the jitted fn."""
        return jax.jit(self.local_system)

    def set_verbose(self, verbose: bool) -> None:
        self._verbose = bool(verbose)
