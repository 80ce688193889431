"""Cart-pole h20 B=256 banded: check_every x scaling_refresh sweep after
the batch-last driver rewrite (round 5).  Same harness as _profile_ruiz."""
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
          f"qp_iters {ql.mean():.1f} finite={ok} "
          f"windows {[round(B*ticks/t) for t in times]}", flush=True)


run("ce=5  step-ruiz (r04 bench cfg)", check_every=5)
run("ce=5  tick-ruiz", check_every=5, scaling_refresh="tick")
run("ce=2  tick-ruiz", check_every=2, scaling_refresh="tick")
run("ce=1  tick-ruiz", check_every=1, scaling_refresh="tick")
run("ce=2  step-ruiz", check_every=2)
