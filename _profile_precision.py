"""Headline precision experiment (VERDICT round-4 weak #5 / next #2).

The headline DI h20 B=4096 path is measured compute-bound at f32-HIGHEST
(6-pass matmuls): not HBM-bound (round-3 VMEM-resident kernel), not
launch-bound (round-4 fused_gemm negative).  The surviving lever is the
iteration-GEMM precision itself.  ``ADMMSettings.iter_precision`` lowers
ONLY the iteration GEMMs to 3-pass "high" (or the x-chain only, "mixed")
while the termination residuals stay at HIGHEST — so any run that
converges is exactly as accurate as the default at the OSQP tolerance,
and the observable cost is extra ADMM iterations.  This prints, per mode:
ms/tick, solves/s, and mean ADMM iterations per SQP step (the
convergence-validation gate).
"""
import time
import numpy as np
import jax

from optimal_control_problem_tpu.models import double_integrator as di
from optimal_control_problem_tpu.parallel import BatchedSolver
from optimal_control_problem_tpu.utils.serialization import enable_compilation_cache

enable_compilation_cache()

B, ticks = 4096, 100
H, dt = 20, 0.005
rng = np.random.default_rng(0)
frames = np.zeros((B, di.FRAME), np.float32)
frames[:, 0:2] = rng.uniform(-1, 1, size=(B, 2)).astype(np.float32)
refs = np.tile(di.reference_circle(H, dt)[None, :], (B, 1)).astype(np.float32)


def run(name, **admm_over):
    admm = {"method": "condensed", "eps_abs": 1e-3, "eps_rel": 1e-3,
            "max_iter": 1000, "adaptive_rho": True}
    admm.update(admm_over)
    cfg = di.make_config(
        horizon=H, dt=dt, solve_method="TPU_SQP", alpha=0.1, step_num=10,
        formulation="reduced", ADMM_settings=admm,
    )
    b = BatchedSolver(di.build(cfg))
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
    per_tick = min(times) / ticks
    ql = np.asarray(b.last_result.qp_iters)
    ok = bool(np.isfinite(np.asarray(trajs)).all())
    print(f"{name}: {per_tick*1e3:.2f} ms/tick ({B/per_tick:.0f} solves/s) "
          f"qp_iters/step {ql.mean():.1f} finite={ok} "
          f"windows {[round(B*ticks/t) for t in times]}", flush=True)


run("highest (r04 default)")
run("high    (3-pass iter)", iter_precision="high")
run("mixed   (x-chain 3-pass)", iter_precision="mixed")
