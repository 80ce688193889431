"""User-facing problem builder + MPC front-end — the TPU-native equivalent of
the reference's ``OptimalControlProblem`` base class
(``/root/reference/include/optimal_control_problem/OptimalControlProblem.h``,
``/root/reference/src/OptimalControlProblem.cpp``).

Capabilities replicated (SURVEY.md section 2, C1):

* cost/constraint registries: ``add_scalar_cost`` (cpp:444-446),
  ``add_vector_cost`` — quadratic form ``c^T diag(w) c`` (cpp:574-600),
  ``add_inequality_constraint`` (cpp:448-465),
  ``add_equation_constraint`` x2 (cpp:467-489),
  ``get_cost_function`` summing the registry (cpp:491-497);
* solver-settings parsing and validation (cpp:22-43, 54-62) with the YAML
  schema of ``readme.md:44-62``;
* solver generation & dispatch over {IPOPT, SQP, CUDA_SQP/TPU_SQP, MIXED}
  (``genSolver``, cpp:224-442);
* per-tick solve with first-frame pinning (the MPC initial condition is
  imposed by setting ``lbx = ubx = frame`` on the first frame, cpp:93-96),
  warm start across ticks (cpp:102-113, 212), and input validation
  (``solverInputCheck``, cpp:511-552);
* the subclass hook ``deploy_constraints_and_add_cost``
  (pure virtual at ``OptimalControlProblem.h:101``) — optional here, since
  the builder API also works imperatively without subclassing (the shape the
  stale ``test/test.cpp`` uses for the raw solver).

TPU-native differences: "code generation" is XLA jit with the persistent
compilation cache standing in for the reference's gcc-compiled ``.so``
artifacts (cpp:602-640, 120-143); costs/constraints may be :class:`Sym`
expressions *or* plain JAX callables ``fn(X, P)``; and the generated solver
is a pure jitted function that batches under ``vmap`` (see
``parallel/batch.py``).
"""

from __future__ import annotations

import enum
from typing import Any, Callable, Dict, List, Optional, Sequence, Union

import jax.numpy as jnp
import numpy as np

from .config import OCPConfig, load_config
from .sym import Sym, evaluate, sym
from .solvers.sqp import SQPOptimizationSolver, SQPOptions
from .solvers.admm import ADMMSettings
from .solvers.reference import solve_nlp_host
from .utils.logging import ocp_info, ocp_warn

__all__ = ["SolverType", "SolverSettings", "OptimalControlProblem"]


class SolverType(enum.Enum):
    """Solver menu, parity with ``OptimalControlProblem.h:17-22``.

    ``TPU_SQP`` is the native hot path — the analog of the reference's
    ``CUDA_SQP`` (its name is accepted as an alias for config compatibility).
    """

    IPOPT = "IPOPT"
    SQP = "SQP"
    TPU_SQP = "TPU_SQP"
    MIXED = "MIXED"


class SolverSettings:
    """Parsed ``solver_settings`` (``OptimalControlProblem.h:15-37``)."""

    def __init__(self, node: Dict[str, Any]):
        # Required keys, mirroring validateConfig (cpp:54-62).
        required = [
            "max_iter",
            "warm_start",
            "SQP_settings",
            "verbose",
            "gen_code",
            "load_lib",
            "solve_method",
        ]
        for key in required:
            if key not in node:
                raise ValueError(f"Invalid configuration file: missing solver_settings.{key}")
        sqp_node = node["SQP_settings"]
        for key in ("alpha", "step_num"):
            if key not in sqp_node:
                raise ValueError(f"Invalid configuration file: missing SQP_settings.{key}")

        self.max_iter = int(node["max_iter"])
        self.warm_start = bool(node["warm_start"])
        self.verbose = bool(node["verbose"])
        self.gen_code = bool(node["gen_code"])
        self.load_lib = bool(node["load_lib"])
        self.recompile = bool(node.get("recompile", False))
        self.alpha = float(sqp_node["alpha"])
        self.step_num = int(sqp_node["step_num"])
        # Optional step-size rule extension (solvers/sqp.SQPOptions):
        # "none" = reference fixed damped step; "merit" = candidate line
        # search on an L1 exact-penalty merit function.
        self.line_search = str(sqp_node.get("line_search", "none"))
        self.ls_num = int(sqp_node.get("ls_num", 8))
        self.ls_alpha_max = float(sqp_node.get("ls_alpha_max", 1.0))
        self.ls_merit_mu = float(sqp_node.get("ls_merit_mu", 10.0))
        # Reference-parity preset (SQPOptions.parity): augmented z, raw
        # objective Hessian (reg 0.0), fixed damped step, no shared-system
        # shortcut — the exact SQPOptimizationSolver.cpp semantics.
        self.parity = bool(sqp_node.get("parity", False))
        # Hessian convexification ("auto" | "eigh" | float; 0.0 = reference).
        hr = sqp_node.get("hessian_reg", 0.0 if self.parity else "auto")
        self.hessian_reg = hr if isinstance(hr, str) else float(hr)
        # ||alpha*dx|| early exit: None ties it to `verbose` like the
        # reference (SQPOptimizationSolver.cpp:189-196).
        ee = sqp_node.get("early_exit", None)
        self.early_exit = None if ee is None else bool(ee)
        self.early_exit_tol = float(sqp_node.get("early_exit_tol", 1e-6))
        # MIXED tick-2+ dispatch: "reference" = always SQP after the first
        # tick (what OptimalControlProblem.cpp:92,153-161 actually does —
        # `res` is freshly default-constructed each call, so the f-based
        # IPOPT branch never fires); "intent" = the comment's intent (IPOPT
        # whenever the previous objective stayed above 1e-6) as an opt-in.
        self.mixed_dispatch = str(node.get("mixed_dispatch", "reference"))
        if self.mixed_dispatch not in ("reference", "intent"):
            raise ValueError(
                f"mixed_dispatch must be 'reference' or 'intent', "
                f"got {self.mixed_dispatch!r}"
            )

        method = str(node["solve_method"])
        if method == "CUDA_SQP":  # accepted alias (readme.md:58)
            method = "TPU_SQP"
        try:
            self.solver_type = SolverType(method)
        except ValueError:
            raise ValueError(f"Unknown solver type: {method}") from None

        # TPU-specific extensions (all optional, defaults match reference
        # semantics as closely as possible).
        self.formulation = str(node.get("formulation", "augmented"))
        self.qp_warm_start_explicit = "qp_warm_start" in node
        self.qp_warm_start = bool(node.get("qp_warm_start", True))
        ss = node.get("shared_system", None)
        self.shared_system = None if ss is None else bool(ss)
        self.dtype = jnp.float64 if node.get("precision", "f32") == "f64" else jnp.float32
        admm_node = node.get("ADMM_settings", {})
        self.admm = ADMMSettings(
            rho=float(admm_node.get("rho", 0.1)),
            sigma=float(admm_node.get("sigma", 1e-6)),
            alpha=float(admm_node.get("alpha", 1.6)),
            eps_abs=float(admm_node.get("eps_abs", 1e-3)),
            eps_rel=float(admm_node.get("eps_rel", 1e-3)),
            max_iter=int(admm_node.get("max_iter", 10000)),
            check_every=int(admm_node.get("check_every", 25)),
            scaling_iters=int(admm_node.get("scaling_iters", 10)),
            scaling_refresh=str(admm_node.get("scaling_refresh", "step")),
            adaptive_rho=bool(admm_node.get("adaptive_rho", True)),
            method=str(admm_node.get("method", "kkt")),
            banded_solver=str(admm_node.get("banded_solver", "thomas")),
            backend=str(admm_node.get("backend", "xla")),
            precision=str(admm_node.get("precision", "highest")),
            fused_gemm=bool(admm_node.get("fused_gemm", False)),
            polish=bool(admm_node.get("polish", False)),
            check_infeasibility=bool(
                admm_node.get("check_infeasibility", True)
            ),
            eps_prim_inf=float(admm_node.get("eps_prim_inf", 1e-4)),
            eps_dual_inf=float(admm_node.get("eps_dual_inf", 1e-4)),
        )
        # Whether the user pinned the QP method; when absent, gen_solver is
        # free to auto-select "banded" for long-horizon stage structures.
        self.admm_method_explicit = "method" in admm_node

    @classmethod
    def default_node(cls, solve_method: str = "TPU_SQP") -> Dict[str, Any]:
        """A complete solver_settings mapping with reference defaults
        (``OptimalControlProblem.h:24-36``: alpha=0.1, step_num=10)."""
        return {
            "max_iter": 1000,
            "warm_start": True,
            "verbose": False,
            "gen_code": False,
            "load_lib": False,
            "solve_method": solve_method,
            "SQP_settings": {"alpha": 0.1, "step_num": 10},
        }


CostLike = Union[Sym, Callable]
ExprLike = Union[Sym, Callable]


class OptimalControlProblem:
    """Build a discretized OCP and solve it each MPC tick.

    Usage (mirrors the reference flow, SURVEY.md section 3.1)::

        ocp = OptimalControlProblem(yaml_node)      # or subclass
        ocp.set_reference(ref_size)                 # creates the parameter vector
        ...add costs / constraints...               # or deploy_constraints_and_add_cost()
        ocp.gen_solver()
        ocp.compute_optimal_trajectory(frame, reference)   # per tick
        traj = ocp.get_optimal_trajectory()
    """

    def __init__(self, config_node: Any):
        node = load_config(config_node)
        if "solver_settings" not in node:
            raise ValueError("Invalid configuration file: missing solver_settings")
        self.solver_settings = SolverSettings(node["solver_settings"])
        self.ocp_config = OCPConfig(node)
        self._config_node = node

        self._costs: List[CostLike] = []
        self._constraints: List[ExprLike] = []
        self._constraint_names: List[str] = []
        self._constraint_sizes: List[int] = []
        self._constraint_lower: List[np.ndarray] = []
        self._constraint_upper: List[np.ndarray] = []

        self._reference: Optional[Sym] = None
        self._stage_structure = None
        self._first_time = True
        self._optimal_trajectory: Optional[jnp.ndarray] = None
        self._last_f: Optional[float] = None
        self._solver: Optional[SQPOptimizationSolver] = None
        self._nlp_fns = None  # (f_fn, g_fn)
        self._generated = False

        if self.solver_settings.gen_code or self.solver_settings.load_lib:
            # TPU analog of the reference's .so codegen cache
            # (cpp:602-640): the XLA persistent compilation cache.
            import jax

            try:
                jax.config.update("jax_compilation_cache_dir", ".ocp_xla_cache")
                ocp_info("XLA persistent compilation cache enabled (.ocp_xla_cache)")
            except Exception as e:  # pragma: no cover
                ocp_warn(f"could not enable XLA compilation cache: {e}")

    # ------------------------------------------------------------------
    # hook for subclasses (OptimalControlProblem.h:101)
    def deploy_constraints_and_add_cost(self) -> None:
        """Override in subclasses to define dynamics, costs, constraints."""
        raise NotImplementedError

    # ------------------------------------------------------------------
    # reference parameter vector
    def set_reference(self, reference: Union[Sym, int]) -> None:
        """Define the parameter (reference-trajectory) vector ``p``
        (``setReference``, cpp:570-572).  Accepts a leaf :class:`Sym` or an
        int size (a leaf named ``"P"`` is created)."""
        if isinstance(reference, int):
            reference = sym("P", reference)
        if not isinstance(reference, Sym) or reference.name is None:
            raise ValueError("reference must be a leaf Sym or an int size")
        self._reference = reference

    def get_reference(self) -> Optional[Sym]:
        return self._reference

    @property
    def reference_size(self) -> int:
        return 0 if self._reference is None else self._reference.size1()

    # ------------------------------------------------------------------
    # cost registry (cpp:444-446, 574-600)
    def add_scalar_cost(self, cost: CostLike) -> None:
        if isinstance(cost, Sym) and cost.size1() != 1:
            raise ValueError("scalar cost must have size 1")
        self._costs.append(cost)

    def add_vector_cost(self, weights: Sequence[float], cost: ExprLike) -> None:
        """Quadratic-form cost ``sum_i w_i * c_i(X,P)^2`` (cpp:574-600)."""
        w = np.asarray(weights, dtype=np.float64).reshape(-1)
        if isinstance(cost, Sym):
            if w.shape[0] != cost.size1():
                raise ValueError(
                    "weight vector and cost expression dimensions differ"
                )
            self._costs.append(_sym_quadform(w, cost))
        else:
            self._costs.append(
                lambda X, P, w=jnp.asarray(w), c=cost: jnp.sum(
                    w * jnp.square(jnp.asarray(c(X, P)).reshape(-1))
                )
            )

    def get_cost_function(self) -> Callable:
        """Total cost as a callable ``f(X, P) -> scalar`` (cpp:491-497)."""
        costs = list(self._costs)

        def f_fn(X, P):
            total = jnp.asarray(0.0, X.dtype)
            for c in costs:
                total = total + _eval_term(c, X, P, self._leaf_names())
            return total

        return f_fn

    # ------------------------------------------------------------------
    # constraint registry (cpp:448-489)
    def add_inequality_constraint(
        self,
        constraint_name: str,
        lower_bound: Sequence[float],
        expression: ExprLike,
        upper_bound: Sequence[float],
    ) -> None:
        lb = np.atleast_1d(np.asarray(lower_bound, dtype=np.float64))
        ub = np.atleast_1d(np.asarray(upper_bound, dtype=np.float64))
        size = _expr_size(expression, self)
        if lb.shape[0] != size or ub.shape[0] != size:
            raise ValueError(
                "inequality constraint bounds/expression dimensions differ"
            )
        self._constraints.append(expression)
        self._constraint_names.extend([constraint_name] * size)
        self._constraint_sizes.append(size)
        self._constraint_lower.append(lb)
        self._constraint_upper.append(ub)

    def add_equation_constraint(
        self,
        constraint_name: str,
        left: ExprLike,
        right: Optional[ExprLike] = None,
    ) -> None:
        """``left == right`` (or ``left == 0``), as ``0 <= left-right <= 0``
        (cpp:467-489)."""
        if right is None:
            expr = left
        elif isinstance(left, Sym) and isinstance(right, Sym):
            if left.size1() != right.size1():
                raise ValueError("equation constraint sides have different dimensions")
            expr = left - right
        elif callable(left) and callable(right):
            expr = lambda X, P, l=left, r=right: (
                jnp.asarray(l(X, P)).reshape(-1) - jnp.asarray(r(X, P)).reshape(-1)
            )
        elif isinstance(left, Sym):
            expr = left - np.asarray(right, dtype=np.float64)
        else:
            raise ValueError("unsupported equation constraint operand types")
        size = _expr_size(expr, self)
        self._constraints.append(expr)
        self._constraint_names.extend([constraint_name] * size)
        self._constraint_sizes.append(size)
        self._constraint_lower.append(np.zeros(size))
        self._constraint_upper.append(np.zeros(size))

    def get_constraints(self) -> List[ExprLike]:
        return list(self._constraints)

    def get_constraint_names(self) -> List[str]:
        return list(self._constraint_names)

    def get_constraint_lower_bounds(self) -> np.ndarray:
        if self._stage_structure is not None and hasattr(self, "_structure_lbg"):
            return self._structure_lbg
        return (
            np.concatenate(self._constraint_lower)
            if self._constraint_lower
            else np.zeros(0)
        )

    def get_constraint_upper_bounds(self) -> np.ndarray:
        if self._stage_structure is not None and hasattr(self, "_structure_ubg"):
            return self._structure_ubg
        return (
            np.concatenate(self._constraint_upper)
            if self._constraint_upper
            else np.zeros(0)
        )

    @property
    def num_constraints(self) -> int:
        if self._stage_structure is not None:
            return self._stage_structure.n_g
        return sum(self._constraint_sizes)

    # ------------------------------------------------------------------
    def _leaf_names(self):
        x_name = self.ocp_config.get_variables().name
        p_name = self._reference.name if self._reference is not None else None
        return x_name, p_name

    def _build_nlp_fns(self):
        f_fn = self.get_cost_function()
        constraints = list(self._constraints)
        if constraints:
            leaf = self._leaf_names()

            def g_fn(X, P):
                parts = [
                    jnp.atleast_1d(_eval_term(c, X, P, leaf, scalar=False))
                    for c in constraints
                ]
                return jnp.concatenate(parts)

        else:
            g_fn = None
        return f_fn, g_fn

    def set_stage_structure(self, structure) -> None:
        """Declare the problem's stage-separable structure (stagewise.py).

        When set, ``gen_solver`` derives the NLP functions AND a structured
        local-system builder from it (per-stage vmapped derivatives instead
        of dense full-vector Hessians) — the cost/constraint registries are
        not used.  Requires ``formulation: reduced``.
        """
        from .stagewise import StageStructure

        if not isinstance(structure, StageStructure):
            raise TypeError("expected a StageStructure")
        cfg = self.ocp_config
        if structure.horizon != cfg.get_horizon() or (
            structure.frame_size != cfg.get_frame_size()
        ):
            raise ValueError(
                "stage structure does not match the config's horizon/frame"
            )
        self._stage_structure = structure

    def gen_solver(self) -> None:
        """Trace the NLP and construct the selected backend
        (``genSolver``, cpp:224-442)."""
        if self.ocp_config.num_variables == 0:
            raise RuntimeError("Status or input variables are empty")

        parts = None
        if self._stage_structure is not None:
            from .stagewise import build_stagewise_fns, build_stagewise_parts

            ss = self._stage_structure
            f_fn, g_fn, lbg, ubg = build_stagewise_fns(ss)
            self._structure_lbg = lbg
            self._structure_ubg = ubg
            st = self.solver_settings
            if getattr(st, "parity", False):
                # Parity preset = the reference's exact dense augmented-z
                # flow; the stage structure still defines the NLP functions
                # but the structured QP fast paths stay out of the solve.
                pass
            else:
                if st.formulation != "reduced":
                    st.formulation = "reduced"
                parts = build_stagewise_parts(ss, st.dtype, "auto")
                # The block-tridiagonal QP path is O(N w^3) against the dense
                # operator's O(N^3 w^3) and measured faster at EVERY horizon
                # (cart-pole h8: 1.7x, h20: 1.5x, quadrotor h100: >12x — see
                # docs/PERFORMANCE.md); make it the default whenever a stage
                # structure is registered and the user did not pin a method.
                if (
                    not getattr(st, "admm_method_explicit", True)
                    and st.admm.method == "kkt"
                ):
                    st.admm = st.admm.replace(method="banded")
        else:
            if not self._constraints:
                raise RuntimeError("Constraints are empty")  # cpp:230-233
            f_fn, g_fn = self._build_nlp_fns()
        self._nlp_fns = (f_fn, g_fn)

        st = self.solver_settings
        if st.solver_type in (SolverType.TPU_SQP, SolverType.MIXED, SolverType.SQP):
            nlp = {
                "x": self.ocp_config.get_variables(),
                "f": f_fn,
                "g": g_fn,
                "p": self.reference_size,
            }
            kw = dict(
                max_iter=st.step_num,
                alpha=st.alpha,
                verbose=st.verbose,
                qp_warm_start=st.qp_warm_start,
                dtype=st.dtype,
                admm=st.admm,
                early_exit=getattr(st, "early_exit", None),
                early_exit_tol=getattr(st, "early_exit_tol", 1e-6),
            )
            if getattr(st, "parity", False):
                # Reference-parity preset: pins formulation/hessian_reg/
                # line_search/shared_system/qp_warm_start to the exact cpp
                # semantics (QPs cold-start unless the user explicitly set
                # qp_warm_start in the config).
                if not getattr(st, "qp_warm_start_explicit", True):
                    kw.pop("qp_warm_start", None)
                options = SQPOptions.parity(**kw)
            else:
                options = SQPOptions(
                    formulation=st.formulation,
                    shared_system=st.shared_system,
                    hessian_reg=getattr(st, "hessian_reg", "auto"),
                    line_search=getattr(st, "line_search", "none"),
                    ls_num=getattr(st, "ls_num", 8),
                    ls_alpha_max=getattr(st, "ls_alpha_max", 1.0),
                    ls_merit_mu=getattr(st, "ls_merit_mu", 10.0),
                    **kw,
                )
            self._solver = SQPOptimizationSolver(
                nlp,
                options,
                local_system_parts=parts,
                stage_structure=self._stage_structure,
            )
        self._generated = True

        if st.verbose:
            print(
                "Problem dimensions:\n"
                f"Variables: {self.ocp_config.num_variables}\n"
                f"Constraints: {self.num_constraints}\n"
                f"Parameters: {self.reference_size}"
            )

    # ------------------------------------------------------------------
    def solver_input_check(self, arg: Dict[str, Any]) -> bool:
        """Dimension validation (``solverInputCheck``, cpp:511-552)."""
        n_g = self.num_constraints
        n_x = self.ocp_config.num_variables
        n_p = self.reference_size
        checks = [
            ("lbg", n_g),
            ("ubg", n_g),
            ("lbx", n_x),
            ("ubx", n_x),
            ("x0", n_x),
            ("p", n_p),
        ]
        for name, expected in checks:
            actual = int(np.asarray(arg[name]).reshape(-1).shape[0])
            if actual != expected:
                ocp_warn(f"{name} has wrong dimension: expected {expected}, got {actual}")
                return False
        return True

    def compute_optimal_trajectory(self, frame, reference=None) -> None:
        """One MPC tick (``computeOptimalTrajectory``, cpp:78-222).

        ``frame`` is the measured state for the first discretization step; it
        is imposed by pinning the first-frame box bounds (cpp:93-96).
        """
        if not self._generated:
            raise RuntimeError("gen_solver() must be called before solving")
        cfg = self.ocp_config
        frame = np.asarray(frame, dtype=np.float64).reshape(-1)
        if frame.shape[0] != cfg.get_frame_size():
            raise ValueError(
                f"State dimension mismatch: received {frame.shape[0]}, "
                f"expected {cfg.get_frame_size()}"
            )
        if reference is None:
            reference = np.zeros(0)
        reference = np.asarray(reference, dtype=np.float64).reshape(-1)
        if reference.shape[0] != self.reference_size:
            raise ValueError(
                f"Reference dimension mismatch: received {reference.shape[0]}, "
                f"expected {self.reference_size}"
            )

        lbx = cfg.lower_bounds_flat().copy()
        ubx = cfg.upper_bounds_flat().copy()
        fs = cfg.get_frame_size()
        lbx[:fs] = frame  # first-frame pinning (cpp:95-96)
        ubx[:fs] = frame
        lbg = self.get_constraint_lower_bounds()
        ubg = self.get_constraint_upper_bounds()

        if self._first_time:
            ig = cfg.get_initial_guess()
            x0 = ig if ig is not None else np.zeros(cfg.num_variables)
        else:
            x0 = np.asarray(self._optimal_trajectory)

        arg = {
            "lbx": lbx,
            "ubx": ubx,
            "lbg": lbg,
            "ubg": ubg,
            "x0": x0,
            "p": reference,
        }
        if not self.solver_input_check(arg):
            raise RuntimeError("Solver input validation failed")

        st = self.solver_settings
        stype = st.solver_type
        if stype == SolverType.MIXED:
            if getattr(st, "mixed_dispatch", "reference") == "reference":
                # The reference's ACTUAL behavior: `res` is freshly
                # default-constructed each call (cpp:92), so the
                # `res.count("f") > 0 && f > 1e-6` branch (cpp:153-161,
                # 192-200) never fires — IPOPT on the first tick, SQP on
                # every later tick.  Here "SQP" is the TPU SQP engine (the
                # hot path); the host SLSQP stand-in for CasADi sqpmethod
                # remains reachable as SolverType.SQP (see PARITY.md).
                if self._first_time or self._optimal_trajectory is None:
                    stype = SolverType.IPOPT
                else:
                    stype = SolverType.TPU_SQP
            else:
                # "intent" (opt-in): what the reference's comment MEANT —
                # fall back to IPOPT whenever the previous objective stayed
                # above 1e-6.  Host scipy per tick for any nonzero-cost
                # problem; a debugging aid, not a hot path.
                if (
                    self._first_time
                    or self._optimal_trajectory is None
                    or (self._last_f is not None and self._last_f > 1e-6)
                ):
                    stype = SolverType.IPOPT
                else:
                    stype = SolverType.TPU_SQP

        if stype == SolverType.TPU_SQP:
            res = self._solver.get_optimal_solution(arg)
            x_sol = np.asarray(res["x"], dtype=np.float64)
            f_sol = float(res["f"])
        else:
            f_fn, g_fn = self._nlp_fns
            method = "trust-constr" if stype == SolverType.IPOPT else "SLSQP"
            res = solve_nlp_host(
                f_fn, g_fn, x0, reference, lbx, ubx, lbg, ubg, method=method
            )
            x_sol = res["x"]
            f_sol = float(res["f"])
            if self._solver is not None:
                # Seed the TPU solver's persistent iterate so a MIXED
                # hand-off continues from the host solution.
                self._solver._result_x = jnp.asarray(x_sol, self._solver.dtype)

        self._first_time = False
        self._optimal_trajectory = jnp.asarray(x_sol)
        self._last_f = f_sol

        if st.verbose:
            print("=================== result ===================")
            print(f"objective: {f_sol}")
            print(f"solution: {x_sol}")

    def get_optimal_trajectory(self):
        """Latest full-horizon solution (``getOptimalTrajectory``, cpp:554-556)."""
        return self._optimal_trajectory

    def get_solver_stats(self) -> Dict[str, Any]:
        """Per-tick solve statistics from the last TPU_SQP solve.

        Programmatic form of what the reference prints when verbose
        (per-iteration breakdown, SQPOptimizationSolver.cpp:133-213):
        ``f_history`` (objective after each SQP step), ``qp_iters``
        (ADMM iterations per step), ``step_norms`` (``||alpha*dx||`` per
        step), and ``objective``.  Empty dict before the first TPU solve
        or for host-backend ticks.
        """
        res = getattr(self._solver, "last_result", None) if self._solver else None
        if res is None:
            return {}
        out = {
            "objective": float(res.f),
            "f_history": np.asarray(res.f_history),
            "qp_iters": np.asarray(res.qp_iters),
            "step_norms": np.asarray(res.step_norms),
        }
        qc = np.asarray(res.qp_converged)
        if qc.size:  # per-step QP status (dense/banded per-scenario paths)
            out["qp_converged"] = qc
            out["qp_prim_inf"] = np.asarray(res.qp_prim_inf)
            out["qp_dual_inf"] = np.asarray(res.qp_dual_inf)
        return out

    def get_optimal_frames(self) -> np.ndarray:
        """Solution reshaped to ``(horizon, frame_size)``."""
        if self._optimal_trajectory is None:
            raise RuntimeError("no solution available")
        cfg = self.ocp_config
        return np.asarray(self._optimal_trajectory).reshape(
            cfg.get_horizon(), cfg.get_frame_size()
        )

    # convenience passthroughs ------------------------------------------
    def get_variable(self, step: int, name: str) -> Sym:
        return self.ocp_config.get_variable(step, name)

    def set_solver_type(self, stype: SolverType) -> None:
        self.solver_settings.solver_type = stype

    def get_solver_type(self) -> SolverType:
        return self.solver_settings.solver_type

    @property
    def solver(self) -> Optional[SQPOptimizationSolver]:
        return self._solver

    @property
    def nlp_functions(self):
        """(f_fn, g_fn) after gen_solver()."""
        return self._nlp_fns


# ----------------------------------------------------------------------
def _sym_quadform(w: np.ndarray, cost: Sym) -> Sym:
    """Build sum_i w_i c_i^2 as a Sym (addVectorCost, cpp:574-586)."""
    from .sym import Sym as _S

    return _S(
        lambda env, memo: jnp.sum(
            jnp.asarray(w, cost._ev(env, memo).dtype) * jnp.square(cost._ev(env, memo))
        ).reshape(1),
        (1,),
        (cost,),
    )


def _expr_size(expr, ocp: "OptimalControlProblem") -> int:
    """Static output size of a cost/constraint term."""
    if isinstance(expr, Sym):
        return expr.size1()
    import jax

    n_x = ocp.ocp_config.num_variables
    n_p = ocp.reference_size
    shape = jax.eval_shape(
        lambda X, P: jnp.asarray(expr(X, P)).reshape(-1),
        jnp.zeros((n_x,)),
        jnp.zeros((n_p,)),
    ).shape
    return int(shape[0])


def _eval_term(term, X, P, leaf_names, scalar: bool = True):
    x_name, p_name = leaf_names
    if isinstance(term, Sym):
        env = {x_name: X}
        if p_name is not None:
            env[p_name] = P
        out = evaluate(term, env)
        return out[0] if scalar else out
    out = jnp.asarray(term(X, P))
    return out.reshape(()) if scalar else out.reshape(-1)
