"""Direct rolled-kernel microbench at quadrotor h100 shapes.

Three timings:
* entry    — done0 = all-ones: the while loop never runs, so the call
             measures kernel entry + M assembly + two-way factorization;
* it=5     — forced budget 5 (one check block);
* it=50    — forced budget 50;
slope = per-ADMM-iteration cost inside the kernel, intercepts attribute
the fixed cost between {assembly+factor} and {XLA prepare/derivatives}
when compared with _profile_quad6's whole-solve numbers.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

from optimal_control_problem_tpu.ops.banded_rolled_kernel import (
    banded_admm_chunk_rolled,
)

N, w, r, r2, B = 100, 16, 12, 1, 128
rng = np.random.default_rng(0)
f32 = np.float32


def mk(*shape):
    return jnp.asarray(rng.normal(size=shape).astype(f32) * 0.1)


Hb = np.zeros((N, w, w, B), f32)
for k in range(N):
    L = rng.normal(size=(w, w)) * 0.3
    Hb[k] = ((L @ L.T + np.eye(w)).astype(f32))[:, :, None]
HbT = jnp.asarray(Hb)
J0T, J1T = mk(N - 1, r, w, B), mk(N - 1, r, w, B)
JcT = mk(N, r2, w, B)
qT = mk(N, w, B)
ones = lambda *s: jnp.ones(s, f32)
bounds = {
    "lx": -2 * ones(N, w, B), "ux": 2 * ones(N, w, B), "rx": 0.1 * ones(N, w, B),
    "ld": -0.0 * ones(N - 1, r, B), "ud": 0.0 * ones(N - 1, r, B),
    "rd": ones(N - 1, r, B), "lc": -2 * ones(N, r2, B), "uc": 2 * ones(N, r2, B),
    "rc": 0.1 * ones(N, r2, B),
}
scaleT = {"ds": ones(N, w, B), "ex": ones(N, w, B), "ed": ones(N - 1, r, B),
          "ec": ones(N, r2, B), "ci": ones(B)}
xT, yx, yd, yc = mk(N, w, B), mk(N, w, B), mk(N - 1, r, B), mk(N, r2, B)
zx, zd, zc = mk(N, w, B), mk(N - 1, r, B), mk(N, r2, B)
it0 = jnp.zeros((B,), jnp.int32)

# Pre-assembled M blocks (XLA-side assembly contract, round 5): the
# driver computes these from the scaled operators + rho; here random SPD
# diagonals + small couplings stand in (the microbench times structure,
# not convergence).
MdT = jnp.asarray(Hb) + 0.2 * jnp.eye(w, dtype=jnp.float32)[None, :, :, None]
LsT = mk(N - 1, w, w, B)


def call(x_in, done_val, max_iter):
    # x_in chains the reps by a REAL data dependency so the relay cannot
    # serve repeated identical executions (the impossible-fast glitch).
    done0 = jnp.full((B,), done_val, jnp.int32)
    return banded_admm_chunk_rolled(
        it0, done0, HbT, MdT, LsT, J0T, J1T, JcT, qT, bounds, scaleT,
        x_in, yx, yd, yc, zx, zd, zc,
        interval=max_iter, check_every=5, max_iter=max_iter,
        sigma=1e-6, alpha=1.6, eps_abs=0.0, eps_rel=0.0,
        batch_tile=B, interpret=False,
    )


def bench(name, done_val, max_iter, reps=50):
    # The whole rep chain runs inside ONE jitted scan: per-call host/relay
    # dispatch (~2 ms, larger than the kernel entry itself) never enters
    # the measurement, exactly like the kernel's real in-graph usage.
    @jax.jit
    def chain(x0):
        def body(c, _):
            out = call(c, done_val, max_iter)
            return 0.9 * c + 0.1 * jnp.tanh(out[0]), None
        return jax.lax.scan(body, x0, None, length=reps)[0]

    x_in = chain(xT)
    jax.block_until_ready(x_in)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        x_in = chain(x_in)
        s = float(jnp.sum(x_in))
        times.append((time.perf_counter() - t0) / reps)
        assert np.isfinite(s)
    t = float(np.median(times)) * 1e3
    print(f"{name}: {t:.3f} ms/call windows "
          f"{[round(x*1e3,3) for x in times]}", flush=True)
    return t


t_entry = bench("entry (skip loop)", 1, 50)
t_5 = bench("forced it=5      ", 0, 5)
t_50 = bench("forced it=50     ", 0, 50)
print(f"in-kernel per-iteration: {(t_50 - t_5)/45*1e3:.1f} us; "
      f"assembly+factor+entry: {t_entry:.3f} ms; "
      f"loop fixed (checks etc) at it=5: {t_5 - t_entry:.3f} ms",
      flush=True)
