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

N, w, r, r2, B = 100, 16, 12, 1, 64
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


def call(x_in, done_val, max_iter):
    # x_in chains the reps by a REAL data dependency so the relay cannot
    # serve repeated identical executions (the impossible-fast glitch).
    done0 = jnp.full((B,), done_val, jnp.int32)
    return banded_admm_chunk_rolled(
        it0, done0, HbT, J0T, J1T, JcT, qT, bounds, scaleT,
        x_in, yx, yd, yc, zx, zd, zc,
        interval=max_iter, check_every=5, max_iter=max_iter,
        sigma=1e-6, alpha=1.6, eps_abs=0.0, eps_rel=0.0,
        batch_tile=B, interpret=False,
    )


def bench(name, done_val, max_iter, reps=30):
    x_in = xT
    out = call(x_in, done_val, max_iter)
    x_in = 0.9 * x_in + 0.1 * jnp.tanh(out[0])
    jax.block_until_ready(x_in)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = call(x_in, done_val, max_iter)
            x_in = 0.9 * x_in + 0.1 * jnp.tanh(out[0])
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
