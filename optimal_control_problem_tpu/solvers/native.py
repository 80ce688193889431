"""Runtime-compiled native (C++) reference QP solver.

Two reference capabilities live here (SURVEY.md section 2):

* the **runtime compile-and-load** workflow — the analog of
  ``compileLibrary`` shelling out to gcc and ``dlopen``-ing the result
  (``OptimalControlProblem.cpp:602-640`` and the ``.so`` load path at
  ``cpp:120-143``): :func:`build_native_lib` compiles ``csrc/ref_admm.cpp``
  with ``g++ -O3 -shared -fPIC`` into a cache directory and loads it via
  ``ctypes``;
* the **native QP backend** — the analog of the CuCaQP/OSQP native stack
  (``CuCaQP.cpp``): :func:`native_admm_solve` runs the identical OSQP-style
  algorithm in C++ as an independent oracle for cross-checking the JAX/TPU
  implementation (same scaling, rho rules, relaxation, termination).
"""

from __future__ import annotations

import ctypes
import hashlib
import subprocess
from pathlib import Path
from typing import NamedTuple, Optional

import numpy as np

__all__ = ["build_native_lib", "native_admm_solve", "native_available"]

_REPO_ROOT = Path(__file__).resolve().parents[2]
_SRC = _REPO_ROOT / "csrc" / "ref_admm.cpp"
_CACHE_DIR = _REPO_ROOT / "build" / "native"

_lib = None
_lib_error: Optional[str] = None


def build_native_lib(force: bool = False) -> ctypes.CDLL:
    """Compile (if needed) and load the native reference solver.

    The compiled artifact is content-addressed by the source hash, mirroring
    the reference's recompile-on-change flow (``recompile`` flag,
    readme.md:54).
    """
    global _lib, _lib_error
    if _lib is not None and not force:
        return _lib
    src = _SRC.read_bytes()
    tag = hashlib.sha256(src).hexdigest()[:16]
    _CACHE_DIR.mkdir(parents=True, exist_ok=True)
    out = _CACHE_DIR / f"libref_admm_{tag}.so"
    if force or not out.exists():
        cmd = [
            "g++",
            "-O3",
            "-shared",
            "-fPIC",
            "-std=c++17",
            str(_SRC),
            "-o",
            str(out),
        ]
        proc = subprocess.run(cmd, capture_output=True, text=True)
        if proc.returncode != 0:
            _lib_error = proc.stderr
            raise RuntimeError(f"native build failed:\n{proc.stderr}")
    lib = ctypes.CDLL(str(out))
    f32p = ctypes.POINTER(ctypes.c_float)
    argtypes = [
        ctypes.c_int,
        ctypes.c_int,
        f32p,
        f32p,
        f32p,
        f32p,
        f32p,
        ctypes.c_float,
        ctypes.c_float,
        ctypes.c_float,
        ctypes.c_float,
        ctypes.c_float,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        f32p,
        f32p,
        ctypes.POINTER(ctypes.c_int),
        f32p,
        f32p,
    ]
    # f32 internals (OSQP_USE_FLOAT=ON analog) + f64 second opinion.
    for sym in ("ref_admm_solve", "ref_admm_solve_f64"):
        fn = getattr(lib, sym)
        fn.restype = ctypes.c_int
        fn.argtypes = argtypes
    _lib = lib
    return lib


def native_available() -> bool:
    try:
        build_native_lib()
        return True
    except Exception:
        return False


class NativeQPSolution(NamedTuple):
    x: np.ndarray
    y: np.ndarray
    iters: int
    converged: bool
    r_prim: float
    r_dual: float


def native_admm_solve(
    P: np.ndarray,
    q: np.ndarray,
    A: np.ndarray,
    l: np.ndarray,
    u: np.ndarray,
    rho: float = 0.1,
    sigma: float = 1e-6,
    alpha: float = 1.6,
    eps_abs: float = 1e-3,
    eps_rel: float = 1e-3,
    max_iter: int = 10000,
    check_every: int = 25,
    scaling_iters: int = 10,
    internal_f64: bool = False,
) -> NativeQPSolution:
    """Solve ``min 1/2 x'Px + q'x  s.t. l <= Ax <= u`` with the C++ oracle.

    ``internal_f64=False`` (default) computes every Ruiz pass, factorization,
    iteration, and residual in float32 — the faithful analog of the
    reference's OSQP build (``OSQP_USE_FLOAT=ON``, ``cuda_install.sh:44``).
    ``internal_f64=True`` keeps the f32 I/O but iterates in double for a
    higher-precision second opinion.
    """
    lib = build_native_lib()
    n = int(P.shape[0])
    m = int(A.shape[0]) if A.size else 0
    Pf = np.ascontiguousarray(P, dtype=np.float32)
    qf = np.ascontiguousarray(q, dtype=np.float32).reshape(n)
    Af = np.ascontiguousarray(A, dtype=np.float32).reshape(max(m, 1), n)
    lf = np.ascontiguousarray(l, dtype=np.float32).reshape(max(m, 1))
    uf = np.ascontiguousarray(u, dtype=np.float32).reshape(max(m, 1))
    x = np.zeros(n, dtype=np.float32)
    y = np.zeros(max(m, 1), dtype=np.float32)
    iters = ctypes.c_int(0)
    rp = ctypes.c_float(0.0)
    rd = ctypes.c_float(0.0)

    def ptr(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))

    entry = lib.ref_admm_solve_f64 if internal_f64 else lib.ref_admm_solve
    status = entry(
        n,
        m,
        ptr(Pf),
        ptr(qf),
        ptr(Af),
        ptr(lf),
        ptr(uf),
        ctypes.c_float(rho),
        ctypes.c_float(sigma),
        ctypes.c_float(alpha),
        ctypes.c_float(eps_abs),
        ctypes.c_float(eps_rel),
        max_iter,
        check_every,
        scaling_iters,
        ptr(x),
        ptr(y),
        ctypes.byref(iters),
        ctypes.byref(rp),
        ctypes.byref(rd),
    )
    if status < 0:
        raise RuntimeError("native ADMM solver failed (factorization error)")
    return NativeQPSolution(
        x=x,
        y=y[:m],
        iters=int(iters.value),
        converged=(status == 0),
        r_prim=float(rp.value),
        r_dual=float(rd.value),
    )
