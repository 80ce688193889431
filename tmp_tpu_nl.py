import time, numpy as np, jax, jax.numpy as jnp
from optimal_control_problem_tpu.models import cartpole
from optimal_control_problem_tpu.parallel import BatchedSolver

H = 20
for method, backend in (("condensed","xla"), ("condensed","pallas"), ("kkt","xla")):
    cfg = cartpole.make_config(horizon=H, dt=0.02, alpha=0.3, step_num=10, formulation="reduced",
        ADMM_settings={"method":method,"max_iter":500,"adaptive_rho": backend!="pallas"})
    # patch backend through
    cfg["solver_settings"]["ADMM_settings"] = {"method":method,"max_iter":500,"adaptive_rho": backend!="pallas"}
    ocp = cartpole.build(cfg)
    # override backend in solver options? ADMMSettings parse lacks backend; rebuild via options
    from optimal_control_problem_tpu.solvers.sqp import SQPOptimizationSolver, SQPOptions
    opts = ocp.solver.options
    opts2 = SQPOptions(max_iter=10, alpha=0.3, formulation="reduced",
                       admm=opts.admm.replace(backend=backend), dtype=opts.dtype)
    nlp = {"x": ocp.ocp_config.get_variables(), "f": ocp.nlp_functions[0], "g": ocp.nlp_functions[1], "p": ocp.reference_size}
    ocp._solver = SQPOptimizationSolver(nlp, opts2)
    B = 256
    batched = BatchedSolver(ocp)
    rng = np.random.default_rng(0)
    frames = np.zeros((B, cartpole.FRAME), np.float32)
    frames[:,2] = rng.uniform(-0.5, 0.5, B)  # random pole angles
    refs = np.full((B,1), np.pi, np.float32)
    state = batched.init_state(B)
    t0=time.perf_counter()
    trajs, objs, state = batched.solve(frames, refs, state)
    jax.block_until_ready(trajs)
    compile_s = time.perf_counter()-t0
    t0=time.perf_counter()
    NT=5
    for _ in range(NT):
        trajs, objs, state = batched.solve(frames, refs, state)
    jax.block_until_ready(trajs)
    per = (time.perf_counter()-t0)/NT
    print(f"cartpole {method}/{backend}: B={B} compile={compile_s:.0f}s tick={per*1e3:.1f}ms solves/s={B/per:.0f} finite={bool(jnp.isfinite(trajs).all())}", flush=True)
