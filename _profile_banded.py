"""Where does the cart-pole banded-batch SQP step spend its time?

Variants (steady-state warm-started MPC ticks, B=256, h=20):
  A full       step_num=10, max_iter=500     — production config
  B qp-light   step_num=10, max_iter=25      — kernel runs 1 check block
  C sqp-1      step_num=1,  max_iter=25      — 1 prepare + 1 light kernel

Per-SQP-step prepare cost ~ (B - C*10/1)/9... really: B ~= 10*(prep + k1),
C ~= prep + k1  =>  prep + k1 = C;  A - B ~= kernel iterations beyond the
first check block.  Reported per-tick times are best-of-3 pipelined windows.
"""
import time
import numpy as np
import jax

from optimal_control_problem_tpu.models import cartpole
from optimal_control_problem_tpu.parallel import BatchedSolver
from optimal_control_problem_tpu.utils.serialization import enable_compilation_cache

enable_compilation_cache()

# 100-tick windows: 10-tick windows carry the ~25 ms relay sync over too
# little compute and inflate per-tick time by ~2.5 ms (docs/PERFORMANCE.md).
B, ticks = 256, 100
rng = np.random.default_rng(0)
frames = np.zeros((B, cartpole.FRAME), np.float32)
frames[:, 2] = rng.uniform(-0.5, 0.5, B).astype(np.float32)
refs = np.full((B, 1), np.pi, np.float32)


def run(name, step_num, max_iter):
    cfg = cartpole.make_config(
        horizon=20, dt=0.04, alpha=0.3, step_num=step_num,
        formulation="reduced",
        ADMM_settings={"method": "banded", "max_iter": max_iter,
                       "adaptive_rho": False, "rho": 0.05},
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
    print(f"{name}: {per_tick*1e3:.2f} ms/tick  ({B/per_tick:.0f} solves/s)  "
          f"qp_iters mean {ql.mean():.1f}", flush=True)
    return per_tick


a = run("A full     ", 10, 500)
bt = run("B qp-light ", 10, 25)
c = run("C sqp-1    ", 1, 25)
print(f"kernel-iterations beyond 1 block (A-B): {(a-bt)*1e3:.2f} ms")
print(f"per-SQP-step prepare+1block (B/10):     {bt/10*1e3:.2f} ms vs C {c*1e3:.2f} ms")
