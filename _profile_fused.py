"""A/B: headline double-integrator h20 B=4096 with fused_gemm on/off."""
import time
import numpy as np
import jax

from optimal_control_problem_tpu.models import double_integrator as di
from optimal_control_problem_tpu.parallel import BatchedSolver
from optimal_control_problem_tpu.utils.serialization import enable_compilation_cache

enable_compilation_cache()

B, ticks = 4096, 100
rng = np.random.default_rng(0)
frames = np.zeros((B, di.FRAME), np.float32)
frames[:, 0:2] = rng.uniform(-1, 1, (B, 2)).astype(np.float32)
refs = np.tile(di.reference_circle(20, 0.005)[None, :], (B, 1)).astype(np.float32)


def run(name, **admm_over):
    admm = {"method": "condensed", "eps_abs": 1e-3, "eps_rel": 1e-3,
            "max_iter": 1000, "adaptive_rho": True}
    admm.update(admm_over)
    cfg = di.make_config(horizon=20, dt=0.005, alpha=0.1, step_num=10,
                         formulation="reduced", ADMM_settings=admm)
    b = BatchedSolver(di.build(cfg))
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


run("3-gemm (baseline) ")
run("fused single gemm ", fused_gemm=True)
