import time, numpy as np, jax, jax.numpy as jnp
from optimal_control_problem_tpu.models import cartpole, quadrotor
from optimal_control_problem_tpu.parallel import BatchedSolver

def run(name, ocp, frames, refs, B, NT=5):
    batched = BatchedSolver(ocp)
    state = batched.init_state(B)
    t0=time.perf_counter()
    trajs, objs, state = batched.solve(frames, refs, state)
    jax.block_until_ready(trajs); compile_s=time.perf_counter()-t0
    t0=time.perf_counter()
    for _ in range(NT):
        trajs, objs, state = batched.solve(frames, refs, state)
    jax.block_until_ready(trajs)
    per=(time.perf_counter()-t0)/NT
    print(f"{name}: compile={compile_s:.0f}s tick={per*1e3:.1f}ms solves/s={B/per:.0f} finite={bool(jnp.isfinite(trajs).all())}", flush=True)

B=256
cfg = cartpole.make_config(horizon=20, dt=0.02, alpha=0.3, step_num=10, formulation="reduced",
    ADMM_settings={"method":"condensed","max_iter":500,"adaptive_rho":True})
rng = np.random.default_rng(0)
frames = np.zeros((B, cartpole.FRAME), np.float32); frames[:,2]=rng.uniform(-0.5,0.5,B)
refs = np.full((B,1), np.pi, np.float32)
run("cartpole generic", cartpole.build(dict(cfg)), frames, refs, B)
run("cartpole stagewise", cartpole.build(dict(cfg), stagewise=True), frames, refs, B)

Bq=64
cfgq = quadrotor.make_config(horizon=100, dt=0.02, alpha=0.3, step_num=5, formulation="reduced",
    ADMM_settings={"method":"condensed","max_iter":250,"adaptive_rho":True})
fq = np.tile(quadrotor.initial_state()[None,:], (Bq,1)).astype(np.float32)
fq[:,0:2] += rng.uniform(-0.5,0.5,(Bq,2)).astype(np.float32)
rq = np.tile(quadrotor.reference_hover(100)[None,:], (Bq,1)).astype(np.float32)
run("quadrotor h100 stagewise", quadrotor.build(dict(cfgq), stagewise=True), fq, rq, Bq, NT=3)
