"""Checkpoint / resume and solver-artifact serialization.

Reference analogs (SURVEY.md section 5, "Checkpoint / resume"):

* generated solver shared objects cached on disk and reloaded
  (``code_gen/IPOPT_nlp_code.so``, ``OptimalControlProblem.cpp:124-137``)
  -> :func:`export_solver` / :func:`import_solver`: the jitted solve
  function serialized as StableHLO via ``jax.export`` — a portable compiled
  artifact that can be reloaded without re-tracing the problem;
* ``localSystemFunction.save(".casadi")`` serialization
  (``OptimalControlProblem.cpp:404-424``) -> same mechanism applied to any
  jitted function;
* warm-start state carried across ticks (``cpp:113, 212``)
  -> :func:`save_state` / :func:`load_state`: the solver-state pytree
  (iterate + QP warm start) as an ``.npz`` checkpoint, so a long-running MPC
  process can stop and resume mid-mission.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "save_state",
    "load_state",
    "export_solver",
    "import_solver",
    "enable_compilation_cache",
]


def save_state(path: str, **arrays: Any) -> None:
    """Checkpoint named arrays (e.g. ``x=..., qp_x=..., qp_y=...``)."""
    np.savez(path, **{k: np.asarray(v) for k, v in arrays.items()})


def load_state(path: str) -> Dict[str, np.ndarray]:
    with np.load(path) as data:
        return {k: data[k] for k in data.files}


def save_solver_state(solver, path: str) -> None:
    """Checkpoint an ``SQPOptimizationSolver``'s persistent warm-start state
    (the ``result_`` analog, SQPOptimizationSolver.cpp:88-91)."""
    save_state(
        path,
        result_x=solver._result_x,
        result_f=solver._result_f,
        qp_x=solver._qp_x,
        qp_y=solver._qp_y,
    )


def load_solver_state(solver, path: str) -> None:
    state = load_state(path)
    solver._result_x = jnp.asarray(state["result_x"], solver.dtype)
    solver._result_f = jnp.asarray(state["result_f"], solver.dtype)
    solver._qp_x = jnp.asarray(state["qp_x"], solver.dtype)
    solver._qp_y = jnp.asarray(state["qp_y"], solver.dtype)


def export_solver(fn, example_args: Sequence[Any], path: str) -> None:
    """Serialize a jitted function to a portable StableHLO artifact.

    The TPU-native analog of the reference's gcc-compiled ``.so`` solver
    libraries (``compileLibrary``, OptimalControlProblem.cpp:602-640): the
    artifact can be shipped and executed without the Python problem
    definition.
    """
    from jax import export as jax_export

    exported = jax_export.export(jax.jit(fn))(
        *[jax.ShapeDtypeStruct(np.shape(a), jnp.asarray(a).dtype) for a in example_args]
    )
    Path(path).write_bytes(exported.serialize())


def import_solver(path: str):
    """Load a serialized solver artifact; returns a callable."""
    from jax import export as jax_export

    exported = jax_export.deserialize(Path(path).read_bytes())
    return exported.call


def enable_compilation_cache(directory: str = ".ocp_xla_cache") -> None:
    """Persist XLA compilations across processes — the analog of the
    reference's on-disk ``.so`` cache + dlopen fast path (cpp:120-143)."""
    jax.config.update("jax_compilation_cache_dir", directory)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
