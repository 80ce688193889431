import time, os, numpy as np
import jax, jax.numpy as jnp
from optimal_control_problem_tpu.models import double_integrator as di
from optimal_control_problem_tpu.parallel import BatchedSolver

H, dt = 20, 0.005
cfg = di.make_config(horizon=H, dt=dt, alpha=0.1, step_num=10,
    formulation="reduced",
    ADMM_settings={"method":"condensed","eps_abs":1e-3,"eps_rel":1e-3,"max_iter":1000,"adaptive_rho":True})
ocp = di.build(cfg)
s = ocp.solver

for B in (64, 1024, 4096):
    batched = BatchedSolver(ocp)
    rng = np.random.default_rng(0)
    frames = np.zeros((B, di.FRAME), np.float32); frames[:,0:2] = rng.uniform(-1,1,(B,2))
    refs = np.tile(di.reference_circle(H, dt)[None,:], (B,1)).astype(np.float32)
    state = batched.init_state(B)
    for _ in range(3):
        trajs, objs, state = batched.solve(frames, refs, state)
    jax.block_until_ready(trajs)
    ts=[]
    for _ in range(10):
        t0=time.perf_counter(); trajs, objs, state = batched.solve(frames, refs, state); jax.block_until_ready(trajs); ts.append(time.perf_counter()-t0)
    p50 = np.percentile(ts, 50)
    # also get qp_iters from raw solve
    lbx = np.tile(ocp.ocp_config.lower_bounds_flat(), (B,1)).astype(np.float32); ubx = np.tile(ocp.ocp_config.upper_bounds_flat(), (B,1)).astype(np.float32)
    lbx[:,:di.FRAME]=frames; ubx[:,:di.FRAME]=frames
    lbg=np.tile(ocp.get_constraint_lower_bounds(),(B,1)).astype(np.float32); ubg=np.tile(ocp.get_constraint_upper_bounds(),(B,1)).astype(np.float32)
    res = s.solve_batch_fn(state.x, jnp.asarray(refs), jnp.asarray(lbx), jnp.asarray(ubx), jnp.asarray(lbg), jnp.asarray(ubg), state.qp_x, state.qp_y)
    jax.block_until_ready(res.x)
    print(f"B={B}: p50={p50*1e3:.2f}ms  solves/s={B/p50:.0f}  qp_iters/sqp_step={np.asarray(res.qp_iters)}")
