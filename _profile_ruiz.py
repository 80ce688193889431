"""Bisect the banded-batch per-SQP-step fixed work: Ruiz scaling iterations.

Round-4 state: ADMM iterations are free (A==B in _profile_banded); the tick
is 10x the per-step prepare. Ruiz equilibration runs scaling_iters=10 XLA
iterations (vmapped, batch-leading) per SQP step. Sweep scaling_iters to
measure its share.
"""
import time
import numpy as np
import jax

from optimal_control_problem_tpu.models import cartpole
from optimal_control_problem_tpu.parallel import BatchedSolver
from optimal_control_problem_tpu.utils.serialization import enable_compilation_cache

enable_compilation_cache()

B, ticks = 256, 100
rng = np.random.default_rng(0)
frames = np.zeros((B, cartpole.FRAME), np.float32)
frames[:, 2] = rng.uniform(-0.5, 0.5, B).astype(np.float32)
refs = np.full((B, 1), np.pi, np.float32)


def run(name, **admm_over):
    admm = {"method": "banded", "max_iter": 500,
            "adaptive_rho": False, "rho": 0.05}
    admm.update(admm_over)
    cfg = cartpole.make_config(
        horizon=20, dt=0.04, alpha=0.3, step_num=10,
        formulation="reduced", ADMM_settings=admm,
    )
    b = BatchedSolver(cartpole.build(cfg, stagewise=True))
    state = b.init_state(B)
    for _ in range(3):
        trajs, objs, state = b.solve(frames, refs, state)
    jax.block_until_ready(trajs)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(ticks):
            trajs, objs, state = b.solve(frames, refs, state)
        jax.block_until_ready(trajs)
        best = min(best, time.perf_counter() - t0)
    per_tick = best / ticks
    ql = np.asarray(b.last_result.qp_iters)
    ok = bool(np.isfinite(np.asarray(trajs)).all())
    print(f"{name}: {per_tick*1e3:.2f} ms/tick ({B/per_tick:.0f}/s) "
          f"qp_iters {ql.mean():.1f} finite={ok}", flush=True)


run("si=10 ce=25 step-ruiz", )
run("si=10 ce=25 tick-ruiz", scaling_refresh="tick")
run("si=10 ce=5  step-ruiz", check_every=5)
run("si=10 ce=5  tick-ruiz", check_every=5, scaling_refresh="tick")
