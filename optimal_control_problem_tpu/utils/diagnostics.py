"""Solution diagnostics: constraint reports and KKT-quality checks.

Parity targets (SURVEY.md section 5): the reference reserves a ``log/``
directory for CSV constraint dumps (``log/.gitignore``) and substitutes
runtime dimension checks for tests; its only solution-quality signal is the
printed objective.  Here solutions can be audited properly:

* :func:`constraint_report` — per-row constraint values, bounds, violations,
  grouped by the registered constraint names (``constraintNames_`` analog,
  OptimalControlProblem.cpp:460-462);
* :func:`dump_constraints_csv` — the CSV artifact the reference's ``log/``
  dir was reserved for;
* :func:`kkt_residuals` — stationarity/feasibility/complementarity norms for
  a solve, usable as a property test or a production health check.
"""

from __future__ import annotations

import csv
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["constraint_report", "dump_constraints_csv", "kkt_residuals"]


def constraint_report(ocp, X, P=None) -> List[Dict]:
    """Evaluate every registered constraint at ``X`` and report violations.

    Returns a list of rows: ``{name, index, value, lower, upper, violation}``.
    """
    X = jnp.asarray(X).reshape(-1)
    P = jnp.zeros((ocp.reference_size,)) if P is None else jnp.asarray(P).reshape(-1)
    _, g_fn = ocp.nlp_functions if ocp.nlp_functions else ocp._build_nlp_fns()
    if g_fn is None:
        return []
    values = np.asarray(g_fn(X, P), np.float64)
    lb = ocp.get_constraint_lower_bounds()
    ub = ocp.get_constraint_upper_bounds()
    names = ocp.get_constraint_names()
    rows = []
    for i, (v, l, u, name) in enumerate(zip(values, lb, ub, names)):
        violation = max(0.0, l - v, v - u)
        rows.append(
            {
                "name": name,
                "index": i,
                "value": float(v),
                "lower": float(l),
                "upper": float(u),
                "violation": float(violation),
            }
        )
    return rows


def dump_constraints_csv(path: str, ocp, X, P=None) -> None:
    """Write the constraint report as CSV (the reference's ``log/`` artifact)."""
    rows = constraint_report(ocp, X, P)
    with open(path, "w", newline="") as f:
        writer = csv.DictWriter(
            f, fieldnames=["name", "index", "value", "lower", "upper", "violation"]
        )
        writer.writeheader()
        writer.writerows(rows)


def kkt_residuals(
    f_fn,
    g_fn,
    x,
    p,
    lbx,
    ubx,
    lbg,
    ubg,
    y_g: Optional[jnp.ndarray] = None,
) -> Dict[str, float]:
    """Solution-quality metrics for an NLP iterate.

    Returns primal feasibility (box + general constraints) always, plus
    stationarity of the Lagrangian when general-constraint multipliers
    ``y_g`` are provided.
    """
    x = jnp.asarray(x).reshape(-1)
    p = jnp.asarray(p).reshape(-1)
    box_viol = jnp.maximum(
        jnp.maximum(jnp.asarray(lbx) - x, 0.0),
        jnp.maximum(x - jnp.asarray(ubx), 0.0),
    )
    out = {"box_violation": float(jnp.max(box_viol))}
    if g_fn is not None:
        g = g_fn(x, p)
        g_viol = jnp.maximum(
            jnp.maximum(jnp.asarray(lbg) - g, 0.0),
            jnp.maximum(g - jnp.asarray(ubg), 0.0),
        )
        out["constraint_violation"] = float(jnp.max(g_viol))
        if y_g is not None:
            grad_f = jax.grad(lambda xx: f_fn(xx, p))(x)
            _, jvp = jax.vjp(lambda xx: g_fn(xx, p), x)
            stat = grad_f + jvp(jnp.asarray(y_g).reshape(-1))[0]
            out["stationarity"] = float(jnp.max(jnp.abs(stat)))
    out["objective"] = float(f_fn(x, p))
    return out
