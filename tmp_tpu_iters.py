import numpy as np, jax, jax.numpy as jnp
from optimal_control_problem_tpu.models import cartpole
from optimal_control_problem_tpu.parallel import BatchedSolver
from optimal_control_problem_tpu.solvers.admm import ADMMSettings, admm_solve

B=256
cfg = cartpole.make_config(horizon=20, dt=0.02, alpha=0.3, step_num=10, formulation="reduced",
    ADMM_settings={"method":"condensed","max_iter":500,"adaptive_rho":True})
ocp = cartpole.build(cfg)
s = ocp.solver
rng = np.random.default_rng(0)
frames = np.zeros((B, cartpole.FRAME), np.float32); frames[:,2]=rng.uniform(-0.5,0.5,B)
refs = np.full((B,1), np.pi, np.float32)

# one batched tick to get warm state
batched = BatchedSolver(ocp)
state = batched.init_state(B)
trajs, objs, state = batched.solve(frames, refs, state)
jax.block_until_ready(trajs)

# vmap single-scenario solve_fn to recover per-scenario qp_iters
lbx = np.tile(ocp.ocp_config.lower_bounds_flat(), (B,1)).astype(np.float32)
ubx = np.tile(ocp.ocp_config.upper_bounds_flat(), (B,1)).astype(np.float32)
lbx[:,:cartpole.FRAME]=frames; ubx[:,:cartpole.FRAME]=frames
lbg=np.tile(ocp.get_constraint_lower_bounds(),(B,1)).astype(np.float32)
ubg=np.tile(ocp.get_constraint_upper_bounds(),(B,1)).astype(np.float32)
vs = jax.jit(jax.vmap(s.solve_fn, in_axes=(0,0,0,0,0,0,0,0)))
res = vs(state.x, jnp.asarray(refs), jnp.asarray(lbx), jnp.asarray(ubx), jnp.asarray(lbg), jnp.asarray(ubg), state.qp_x, state.qp_y)
iters = np.asarray(res.qp_iters)  # (B, 10)
print("per-SQP-step iter stats over batch:")
print("  median:", np.median(iters, axis=0).astype(int))
print("  p90:   ", np.percentile(iters, 90, axis=0).astype(int))
print("  max:   ", iters.max(axis=0))
print("  frac at cap:", float((iters >= 500).mean()))
