"""Mosaic scheduling probe: do two independent dependent-chains overlap?

Three tiny kernels, each doing 2*K chained dynamic-slice read-modify-write
steps on (S, w, B) scratch(es):
  seq   — one loop of 2*K steps on one ref (pure chain baseline);
  fused2 — K iterations, each body steps TWO chains in DIFFERENT refs;
  fused1 — K iterations, each body steps two chains in the SAME ref
           (disjoint halves, but Mosaic cannot prove it).
If the scheduler overlaps provably-disjoint chains, fused2 ~= seq/2 and
fused1 ~= seq.  Drives the decision on splitting the two-way banded
solver's scratch refs per chain (round 5).
"""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, w, B, K = 144, 16, 128, 64
REPS = 200


def step(ref, k):
    prev = jnp.expand_dims(ref[pl.ds(k - 1, 1)], 1)  # (1,1,w,B)
    cur = ref[pl.ds(k, 1)]
    ref[pl.ds(k, 1)] = cur - 0.01 * jnp.sum(cur[:, :, None, :] * prev, axis=2)


def k_seq(x_ref, o_ref, s_ref):
    s_ref[:] = x_ref[:]

    def body(i, _):
        step(s_ref, i + 1)
        return 0

    jax.lax.fori_loop(0, 2 * K, body, 0)
    o_ref[:] = s_ref[0 : 2 * K + 2]


def k_fused2(x_ref, o_ref, s_ref, s2_ref):
    s_ref[:] = x_ref[0 : S // 2]
    s2_ref[:] = x_ref[S // 2 : S]

    def body(i, _):
        step(s_ref, i + 1)
        step(s2_ref, i + 1)
        return 0

    jax.lax.fori_loop(0, K, body, 0)
    o_ref[:] = jnp.concatenate(
        [s_ref[0 : K + 1], s2_ref[0 : K + 1]], axis=0
    )


def k_fused1(x_ref, o_ref, s_ref):
    s_ref[:] = x_ref[:]

    def body(i, _):
        step(s_ref, i + 1)
        step(s_ref, S // 2 + i + 1)
        return 0

    jax.lax.fori_loop(0, K, body, 0)
    o_ref[:] = jnp.concatenate(
        [s_ref[0 : K + 1], s_ref[S // 2 : S // 2 + K + 1]], axis=0
    )


def build(kern, nscratch, out_rows):
    scratch = [pltpu.VMEM((S if nscratch == 1 else S // 2, w, B), jnp.float32)
               for _ in range(nscratch)]

    @jax.jit
    def run(x):
        def chain(c, _):
            y = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((out_rows, w, B), jnp.float32),
                scratch_shapes=scratch,
            )(c)
            c2 = c.at[0 : out_rows].set(0.999 * y + 0.001 * c[0:out_rows])
            return c2, None
        return jax.lax.scan(chain, x, None, length=REPS)[0]

    return run


x0 = jnp.asarray(np.random.default_rng(0).normal(size=(S, w, B)) * 0.01,
                 jnp.float32)
for name, kern, ns, orows in (
    ("seq   ", k_seq, 1, 2 * K + 2),
    ("fused2", k_fused2, 2, 2 * K + 2),
    ("fused1", k_fused1, 1, 2 * K + 2),
):
    run = build(kern, ns, orows)
    y = run(x0)
    jax.block_until_ready(y)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        y = run(y)
        s = float(jnp.sum(y))
        times.append((time.perf_counter() - t0) / REPS)
        assert np.isfinite(s)
    print(f"{name}: {np.median(times)*1e6:.2f} us/call "
          f"({[round(t*1e6,2) for t in times]})", flush=True)
