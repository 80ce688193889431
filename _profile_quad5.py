"""Quadrotor h100: decompose the tick into fixed (prepare+factor) vs
per-iteration cost.  Forced budgets (eps=0) make every QP run exactly
max_iter iterations: slope between two budgets = per-ADMM-iteration cost,
intercept = per-SQP-step fixed cost (derivatives, scaling, kernel entry,
in-kernel M assembly + factorization)."""
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
    print(f"{name}: {per_tick*1e3:.2f} ms/tick ({B/per_tick:.0f}/s) "
          f"qp_iters {np.mean(ql):.1f} "
          f"windows {[round(t/ticks*1e3, 2) for t in times]}", flush=True)
    return per_tick


# Forced budgets: per-iteration slope and fixed intercept at B=64.
t5 = run("B=64 forced it=5 ", 64, eps_abs=0.0, eps_rel=0.0, max_iter=5,
         check_infeasibility=False)
t50 = run("B=64 forced it=50", 64, eps_abs=0.0, eps_rel=0.0, max_iter=50,
          check_infeasibility=False)
per_it = (t50 - t5) / 45 / 5  # 5 SQP steps
fixed = t5 / 5 - 5 * per_it
print(f"per-ADMM-iteration: {per_it*1e6:.1f} us; "
      f"per-SQP-step fixed: {fixed*1e3:.3f} ms", flush=True)
# Production config reference points (default eps).
run("B=64 prod          ", 64)
run("B=64 prod nocert   ", 64, check_infeasibility=False)
run("B=8  prod          ", 8, ticks=50)
