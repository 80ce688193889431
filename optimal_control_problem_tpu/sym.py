"""Symbolic expression layer: the CasADi-``SX`` analog, built for JAX.

The reference framework builds its NLP symbolically with CasADi ``SX`` column
vectors (see ``/root/reference/src/OCP_config/OCPConfig.cpp:102`` where the flat
decision vector is created as ``SX::sym("X", horizon*frameSize)`` and
``/root/reference/src/OptimalControlProblem.cpp:444-489`` where costs and
constraints are registered as ``SX`` expressions).

On TPU we do not want a symbolic-AD engine: JAX *is* the AD engine, and XLA is
the code generator, so the entire CasADi + codegen + gcc + dlopen apparatus of
the reference (``OptimalControlProblem.cpp:602-640``) collapses into tracing a
pure function and calling ``jax.jit``.  What we keep from CasADi is the *user
experience* of composing expressions imperatively:

    X = sym("X", 40)
    q = X[0:2]
    cost = q[0] ** 2 + sin(q[1])

A :class:`Sym` is a tiny deferred-evaluation node (a closure over its children)
that evaluates to a ``jnp`` array given an environment binding leaf names to
arrays.  ``compile_fn`` turns expression outputs into an ordinary Python
function of the leaf arrays — which is then traced/jit-ed/differentiated by JAX
like any other function.  Evaluation memoizes on node identity so shared
subexpressions (a DAG, as in CasADi) evaluate once.

All expressions are 1-D float vectors of static shape ``(n,)`` (the analog of
CasADi's ``n x 1`` column matrices); scalars are shape ``(1,)``.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax.numpy as jnp
import numpy as np

__all__ = [
    "Sym",
    "sym",
    "const",
    "vertcat",
    "sumsqr",
    "dot",
    "sin",
    "cos",
    "tan",
    "exp",
    "log",
    "sqrt",
    "tanh",
    "abs_",
    "asin",
    "acos",
    "atan",
    "atan2",
    "minimum",
    "maximum",
    "power",
    "norm_2",
    "compile_fn",
    "evaluate",
]


def _as_1d(x) -> jnp.ndarray:
    a = jnp.asarray(x)
    if a.ndim == 0:
        a = a.reshape(1)
    if a.ndim != 1:
        raise ValueError(f"Sym expressions are 1-D vectors; got shape {a.shape}")
    return a


class Sym:
    """A deferred 1-D expression node.

    ``_fn(env, memo)`` computes this node's value; ``children`` keeps strong
    references so ``id()``-based memoization is safe for the duration of an
    ``evaluate`` call.
    """

    __slots__ = ("_fn", "shape", "children", "name")

    def __init__(self, fn, shape, children=(), name=None):
        self._fn = fn
        self.shape = (int(shape[0]),)
        self.children = tuple(children)
        self.name = name

    # -- evaluation -------------------------------------------------------
    def _ev(self, env: dict, memo: dict) -> jnp.ndarray:
        key = id(self)
        val = memo.get(key)
        if val is None:
            val = self._fn(env, memo)
            memo[key] = val
        return val

    # -- introspection ----------------------------------------------------
    def size1(self) -> int:
        """CasADi-compatible row count (``SX::size1``)."""
        return self.shape[0]

    def __len__(self) -> int:
        return self.shape[0]

    def __repr__(self):
        if self.name is not None:
            return f"Sym({self.name!r}, n={self.shape[0]})"
        return f"Sym(n={self.shape[0]})"

    # -- indexing ---------------------------------------------------------
    def __getitem__(self, idx) -> "Sym":
        n = self.shape[0]
        if isinstance(idx, slice):
            start, stop, step = idx.indices(n)
            size = max(0, (stop - start + (step - 1 if step > 0 else step + 1)) // step)
            if size == 0:
                raise IndexError("empty Sym slice")
            return Sym(
                lambda env, memo: self._ev(env, memo)[idx], (size,), (self,)
            )
        idx = int(idx)
        if idx < 0:
            idx += n
        if not 0 <= idx < n:
            raise IndexError(f"index {idx} out of range for Sym of size {n}")
        return Sym(
            lambda env, memo: self._ev(env, memo)[idx : idx + 1], (1,), (self,)
        )

    # -- arithmetic -------------------------------------------------------
    def _binary(self, other, op) -> "Sym":
        if isinstance(other, Sym):
            n, m = self.shape[0], other.shape[0]
            if n != m and n != 1 and m != 1:
                raise ValueError(f"shape mismatch in Sym op: {n} vs {m}")
            out = max(n, m)
            return Sym(
                lambda env, memo: op(self._ev(env, memo), other._ev(env, memo)),
                (out,),
                (self, other),
            )
        arr = _as_1d(np.asarray(other, dtype=np.float64))
        n, m = self.shape[0], arr.shape[0]
        if n != m and n != 1 and m != 1:
            raise ValueError(f"shape mismatch in Sym op: {n} vs {m}")
        out = max(n, m)
        return Sym(lambda env, memo: op(self._ev(env, memo), arr), (out,), (self,))

    def _rbinary(self, other, op) -> "Sym":
        return self._binary(other, lambda a, b: op(b, a))

    def __add__(self, o):
        return self._binary(o, jnp.add)

    def __radd__(self, o):
        return self._rbinary(o, jnp.add)

    def __sub__(self, o):
        return self._binary(o, jnp.subtract)

    def __rsub__(self, o):
        return self._rbinary(o, jnp.subtract)

    def __mul__(self, o):
        return self._binary(o, jnp.multiply)

    def __rmul__(self, o):
        return self._rbinary(o, jnp.multiply)

    def __truediv__(self, o):
        return self._binary(o, jnp.divide)

    def __rtruediv__(self, o):
        return self._rbinary(o, jnp.divide)

    def __pow__(self, o):
        return self._binary(o, jnp.power)

    def __rpow__(self, o):
        return self._rbinary(o, jnp.power)

    def __neg__(self):
        return Sym(lambda env, memo: -self._ev(env, memo), self.shape, (self,))

    def __matmul__(self, o):
        return dot(self, o)


def sym(name: str, size: int) -> Sym:
    """Create a leaf symbol vector — the analog of ``SX::sym(name, size)``."""
    if size < 0:
        raise ValueError("symbol size must be >= 0")

    def fetch(env, memo):
        try:
            val = env[name]
        except KeyError:
            raise KeyError(f"no binding for symbol {name!r}") from None
        val = _as_1d(val)
        if val.shape[0] != size:
            raise ValueError(
                f"symbol {name!r} expects size {size}, bound value has {val.shape[0]}"
            )
        return val

    return Sym(fetch, (size,), (), name=name)


def const(value) -> Sym:
    arr = _as_1d(np.asarray(value, dtype=np.float64))
    return Sym(lambda env, memo: arr, arr.shape, ())


def _unary(op):
    def f(x: Sym) -> Sym:
        if not isinstance(x, Sym):
            x = const(x)
        return Sym(lambda env, memo: op(x._ev(env, memo)), x.shape, (x,))

    return f


sin = _unary(jnp.sin)
cos = _unary(jnp.cos)
tan = _unary(jnp.tan)
exp = _unary(jnp.exp)
log = _unary(jnp.log)
sqrt = _unary(jnp.sqrt)
tanh = _unary(jnp.tanh)
abs_ = _unary(jnp.abs)
asin = _unary(jnp.arcsin)
acos = _unary(jnp.arccos)
atan = _unary(jnp.arctan)


def _binary_fn(op):
    def f(a, b) -> "Sym":
        if not isinstance(a, Sym):
            a = const(a)
        return a._binary(b, op)

    return f


atan2 = _binary_fn(jnp.arctan2)
minimum = _binary_fn(jnp.minimum)
maximum = _binary_fn(jnp.maximum)
power = _binary_fn(jnp.power)


def norm_2(x: Sym) -> Sym:
    """Euclidean norm (CasADi ``norm_2``)."""
    return Sym(
        lambda env, memo: jnp.linalg.norm(x._ev(env, memo)).reshape(1),
        (1,),
        (x,),
    )


def vertcat(*parts) -> Sym:
    """Concatenate expressions — the analog of ``SX::vertcat``."""
    if len(parts) == 1 and isinstance(parts[0], (list, tuple)):
        parts = tuple(parts[0])
    syms = [p if isinstance(p, Sym) else const(p) for p in parts]
    if not syms:
        raise ValueError("vertcat of nothing")
    total = sum(s.shape[0] for s in syms)
    return Sym(
        lambda env, memo: jnp.concatenate([s._ev(env, memo) for s in syms]),
        (total,),
        tuple(syms),
    )


def sumsqr(x: Sym) -> Sym:
    return Sym(
        lambda env, memo: jnp.sum(jnp.square(x._ev(env, memo))).reshape(1),
        (1,),
        (x,),
    )


def dot(a: Sym, b) -> Sym:
    if not isinstance(b, Sym):
        b = const(b)
    if a.shape[0] != b.shape[0]:
        raise ValueError(f"dot shape mismatch: {a.shape[0]} vs {b.shape[0]}")
    return Sym(
        lambda env, memo: jnp.sum(a._ev(env, memo) * b._ev(env, memo)).reshape(1),
        (1,),
        (a, b),
    )


def evaluate(expr: Sym, env: dict) -> jnp.ndarray:
    """Evaluate an expression under leaf bindings ``{name: array}``."""
    return expr._ev(env, {})


def compile_fn(
    outputs: Sequence[Sym] | Sym, inputs: Sequence[Sym]
) -> Callable:
    """Compile expressions to a plain function of the leaf arrays.

    ``inputs`` must be leaf symbols (created via :func:`sym`).  The returned
    function takes arrays positionally (matching ``inputs``) and returns the
    evaluated output array(s).  It is a pure jnp function: freely jit-able,
    grad-able, vmap-able — this replaces the reference's ``casadi::Function``
    objects (e.g. ``SQPOptimizationSolver.cpp:74-77``).
    """
    single = isinstance(outputs, Sym)
    outs = [outputs] if single else list(outputs)
    names = []
    for s in inputs:
        if s.name is None:
            raise ValueError("compile_fn inputs must be leaf symbols with names")
        names.append(s.name)

    def fn(*arrays):
        if len(arrays) != len(names):
            raise TypeError(f"expected {len(names)} arguments, got {len(arrays)}")
        env = dict(zip(names, arrays))
        memo: dict = {}
        results = [o._ev(env, memo) for o in outs]
        return results[0] if single else tuple(results)

    return fn
