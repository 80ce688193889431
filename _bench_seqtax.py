"""Measure the sequence-parallel machinery's overhead at 1 device.

VERDICT round-3 weak #6: the SPIKE/shard_map stack is correctness-tested
on virtual meshes, but nobody measured what the sharding machinery COSTS.
Real multi-chip is unavailable in this environment, so the measurable
number is the 1-device lower bound: run `HorizonShardedSolver` on a
1-device mesh on the real TPU against the single-device banded solve at
matched settings (same model, horizon, SQP iters, ADMM settings, warm
start).  The ratio is the pure sharding tax — SPIKE partitioning,
shard_map plumbing, boundary exchange code — with zero actual
communication.  Prints one JSON line per config.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from optimal_control_problem_tpu.models import cartpole
from optimal_control_problem_tpu.parallel.sharded_solver import (
    HorizonShardedSolver,
)
from optimal_control_problem_tpu.utils.serialization import (
    enable_compilation_cache,
)

enable_compilation_cache()

TICKS = 50


def bench(fn, warm=3):
    for _ in range(warm):
        out = fn()
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(TICKS):
            out = fn()
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / TICKS)
    return best * 1e3  # ms/tick


def main():
    frame = cartpole.initial_state(th=0.3)
    for H in (32, 64):
        admm = {
            "method": "banded",
            "max_iter": 250,
            "adaptive_rho": False,
            "rho": 0.05,
            "check_every": 5,
        }
        cfg = dict(
            horizon=H, dt=0.04, alpha=0.3, step_num=10,
            formulation="reduced", ADMM_settings=dict(admm),
        )
        ocp = cartpole.build(cartpole.make_config(**cfg), stagewise=True)
        ref = np.full((1,), np.pi, np.float32)

        def single():
            ocp.compute_optimal_trajectory(frame, ref)
            return ocp.get_optimal_trajectory()

        t_single = bench(single)

        ocp2 = cartpole.build(cartpole.make_config(**cfg), stagewise=True)
        mesh = Mesh(np.array(jax.devices()[:1]), ("h",))
        sharded = HorizonShardedSolver(ocp2, mesh)

        def shard_tick():
            return sharded.compute_optimal_trajectory(frame, ref)

        t_shard = bench(shard_tick)

        print(
            json.dumps(
                {
                    "model": f"cartpole_h{H}",
                    "single_ms": round(t_single, 3),
                    "sharded_1dev_ms": round(t_shard, 3),
                    "overhead_pct": round(
                        (t_shard / t_single - 1.0) * 100.0, 1
                    ),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
