"""Quadrotor h100 B=64: check_every sweep on the production config.

The kernel iterates until EVERY scenario in the tile converges, so the
effective per-step iteration count is the batch MAX, not the mean; finer
check blocks stop stragglers sooner.  A residual check is ~60
stage-parallel ops (~tens of us) vs ~135 us per avoided iteration, so
ce < 5 should win until check overhead catches up."""
import time
import numpy as np
import jax

from optimal_control_problem_tpu.models import quadrotor
from optimal_control_problem_tpu.parallel import BatchedSolver
from optimal_control_problem_tpu.utils.serialization import enable_compilation_cache

enable_compilation_cache()
rng = np.random.default_rng(0)


def run(name, B, ticks=30, **admm_over):
    admm = {"method": "banded", "max_iter": 250,
            "adaptive_rho": False, "rho": 0.05, "check_every": 5,
            "scaling_refresh": "tick"}
    admm.update(admm_over)
    cfg = quadrotor.make_config(
        horizon=100, dt=0.02, alpha=0.3, step_num=5,
        formulation="reduced", ADMM_settings=admm,
    )
    b = BatchedSolver(quadrotor.build(cfg, stagewise=True))
    frames = np.tile(quadrotor.initial_state()[None, :], (B, 1)).astype(np.float32)
    frames[:, 0:2] += rng.uniform(-0.5, 0.5, (B, 2)).astype(np.float32)
    refs = np.tile(quadrotor.reference_hover(100)[None, :], (B, 1)).astype(np.float32)
    state = b.init_state(B)
    for _ in range(3):
        trajs, objs, state = b.solve(frames, refs, state)
    jax.block_until_ready(trajs)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(ticks):
            trajs, objs, state = b.solve(frames, refs, state)
        jax.block_until_ready(trajs)
        times.append(time.perf_counter() - t0)
    per_tick = float(np.median(times)) / ticks
    ql = np.asarray(b.last_result.qp_iters)
    ok = bool(np.isfinite(np.asarray(trajs)).all())
    print(f"{name}: {per_tick*1e3:.2f} ms/tick ({B/per_tick:.0f}/s) "
          f"qp_iters {np.mean(ql):.1f} finite={ok} "
          f"windows {[round(t/ticks*1e3, 2) for t in times]}", flush=True)


run("B=64 ce=1", 64, check_every=1)
run("B=64 ce=2", 64, check_every=2)
run("B=64 ce=3", 64, check_every=3)
run("B=8  ce=1", 8, ticks=50, check_every=1)
