"""Fused shared-system ADMM chunk kernel vs the XLA loop.

The Pallas path (``backend="pallas"`` on the shared-factorization batched
solver, ops/shared_kernel.py) must reproduce the XLA loop
(admm_batched._admm_iterate_impl) exactly: same iterates, same iteration
counts, same adaptive-rho trajectory.  On CPU the kernel runs in interpret
mode; measured on real TPU the match is bitwise as well
(docs/PERFORMANCE.md, "Fused shared kernel").
"""

import jax.numpy as jnp
import numpy as np
import pytest

from optimal_control_problem_tpu.solvers.admm import ADMMSettings
from optimal_control_problem_tpu.solvers.admm_batched import (
    admm_iterate_prepared,
    prepare_shared,
)
from optimal_control_problem_tpu.ops.shared_kernel import pick_shared_tile


def _problem(B=16, n=6, m=9, seed=0):
    rng = np.random.default_rng(seed)
    L = rng.normal(size=(n, n))
    P = (L @ L.T + 0.5 * np.eye(n)).astype(np.float32)
    A = rng.normal(size=(m, n)).astype(np.float32)
    qs = rng.normal(size=(B, n)).astype(np.float32)
    centers = rng.normal(size=(B, n)) @ A.T
    ls = (centers - rng.uniform(0.2, 1.5, size=(B, m))).astype(np.float32)
    us = (centers + rng.uniform(0.2, 1.5, size=(B, m))).astype(np.float32)
    return map(jnp.asarray, (P, A, qs, ls, us))


@pytest.mark.parametrize("adaptive", [False, True])
def test_fused_bit_matches_xla(adaptive):
    P, A, qs, ls, us = _problem()
    st = ADMMSettings(
        eps_abs=1e-4, eps_rel=1e-4, method="condensed", adaptive_rho=adaptive
    )
    fac = prepare_shared(P, A, ls, us, qs, st)
    sx = admm_iterate_prepared(fac, qs, ls, us, st)
    sp = admm_iterate_prepared(fac, qs, ls, us, st.replace(backend="pallas"))
    assert bool(jnp.all(sx.converged)) and bool(jnp.all(sp.converged))
    assert int(sx.iters) == int(sp.iters)
    # Identical chunk boundaries + identical arithmetic order per iteration:
    # trajectories agree to f32 roundoff (the interpreter's dot reduction
    # order can differ from the XLA GEMM by an ULP; measured bitwise-equal
    # on real TPU for the flagship problem, docs/PERFORMANCE.md).
    np.testing.assert_allclose(
        np.asarray(sx.x), np.asarray(sp.x), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(sx.y), np.asarray(sp.y), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(sx.z), np.asarray(sp.z), rtol=1e-6, atol=1e-6
    )


def test_fused_warm_start_and_multi_tile():
    P, A, qs, ls, us = _problem(B=24)
    st = ADMMSettings(
        eps_abs=1e-4, eps_rel=1e-4, method="condensed", adaptive_rho=True,
        backend="pallas",
    )
    fac = prepare_shared(P, A, ls, us, qs, st)
    cold = admm_iterate_prepared(fac, qs, ls, us, st)
    warm = admm_iterate_prepared(fac, qs, ls, us, st, x0=cold.x, y0=cold.y)
    assert bool(jnp.all(warm.converged))
    assert int(warm.iters) <= int(cold.iters)
    # Multi-tile grid (8-scenario tiles over a 24-scenario batch, with
    # per-tile early exit) must still converge to the same solutions.
    from optimal_control_problem_tpu.solvers.admm_batched import (
        _admm_iterate_fused,
    )
    import jax

    with jax.default_matmul_precision("highest"):
        tiled = _admm_iterate_fused(
            fac, qs, ls, us, st, None, None, batch_tile=8
        )
    assert bool(jnp.all(tiled.converged))
    np.testing.assert_allclose(
        np.asarray(tiled.x), np.asarray(cold.x), atol=5e-3
    )


def test_fused_padding_non_divisible_batch():
    # B=10 with tile 8 -> driver pads 6 replicated scenarios; results for
    # the 10 real scenarios must match the unpadded XLA path.
    P, A, qs, ls, us = _problem(B=10)
    st = ADMMSettings(
        eps_abs=1e-4, eps_rel=1e-4, method="condensed", adaptive_rho=True
    )
    fac = prepare_shared(P, A, ls, us, qs, st)
    sx = admm_iterate_prepared(fac, qs, ls, us, st)
    from optimal_control_problem_tpu.solvers.admm_batched import (
        _admm_iterate_fused,
    )
    import jax

    with jax.default_matmul_precision("highest"):
        sp = _admm_iterate_fused(fac, qs, ls, us, st, None, None, batch_tile=8)
    assert sp.x.shape == (10, qs.shape[1])
    assert bool(jnp.all(sp.converged))
    np.testing.assert_allclose(np.asarray(sp.x), np.asarray(sx.x), atol=5e-3)


def test_fused_infeasibility_certificates():
    P, A, qs, ls, us = _problem()
    B = qs.shape[0]
    # Contradictory duplicated row: a x >= 1 and a x <= -1.
    A2 = jnp.concatenate([A[:1], A[:1], A], axis=0)
    l2 = jnp.concatenate(
        [jnp.full((B, 1), 1.0), jnp.full((B, 1), -jnp.inf), ls], axis=1
    )
    u2 = jnp.concatenate(
        [jnp.full((B, 1), jnp.inf), jnp.full((B, 1), -1.0), us], axis=1
    )
    st = ADMMSettings(
        eps_abs=1e-4, eps_rel=1e-4, method="condensed", adaptive_rho=True,
        backend="pallas",
    )
    fac = prepare_shared(P, A2, l2, u2, qs, st)
    sol = admm_iterate_prepared(fac, qs, l2, u2, st)
    assert bool(jnp.all(sol.prim_inf)), "all scenarios must be certified"
    assert not bool(jnp.any(sol.converged))
    assert int(sol.iters) < st.max_iter, "certificates must end the loop"


def test_fused_dispatch_guards():
    # kkt method and m=0 must fall back to the XLA loop (no kernel support).
    P, A, qs, ls, us = _problem()
    st = ADMMSettings(
        eps_abs=1e-4, eps_rel=1e-4, method="kkt", backend="pallas",
        adaptive_rho=False,
    )
    fac = prepare_shared(P, A, ls, us, qs, st)
    sol = admm_iterate_prepared(fac, qs, ls, us, st)
    assert bool(jnp.all(sol.converged))


def test_pick_shared_tile():
    # Flagship size fits as one program; absurd sizes fall back.
    assert pick_shared_tile(4096, 120, 196) == 4096
    assert pick_shared_tile(100_000, 2048, 4096) not in (100_000,)


@pytest.mark.parametrize("mode", ["high", "mixed"])
@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_iter_precision_variants_converge_to_same_solution(mode, backend):
    """``iter_precision`` lowers only the iteration GEMMs; termination still
    requires the HIGHEST-precision residuals to pass, so a converged
    solution must match the default path at the solver tolerance.  (On CPU
    the precisions are numerically identical — this pins dispatch,
    semantics, and that the Pallas kernel accepts the knob; the
    accuracy/iteration-count tradeoff is measured on real TPU in
    docs/PERFORMANCE.md round 5.)"""
    P, A, qs, ls, us = _problem()
    st = ADMMSettings(
        eps_abs=1e-4, eps_rel=1e-4, method="condensed", adaptive_rho=True,
        backend=backend,
    )
    fac = prepare_shared(P, A, ls, us, qs, st)
    base = admm_iterate_prepared(fac, qs, ls, us, st)
    low = admm_iterate_prepared(
        fac, qs, ls, us, st.replace(iter_precision=mode)
    )
    assert bool(jnp.all(base.converged)) and bool(jnp.all(low.converged))
    np.testing.assert_allclose(
        np.asarray(base.x), np.asarray(low.x), rtol=1e-3, atol=2e-3
    )


def test_iter_precision_validated():
    with pytest.raises(ValueError):
        ADMMSettings(iter_precision="hi")
