import time, numpy as np
import jax, jax.numpy as jnp
print("devices:", jax.devices(), flush=True)

t0=time.perf_counter()
x = jnp.ones((1024,1024), jnp.float32)
y = jax.jit(lambda a: a @ a)(x); jax.block_until_ready(y)
print(f"[1] matmul compile+run {time.perf_counter()-t0:.1f}s", flush=True)

t0=time.perf_counter()
Minv = jax.jit(jnp.linalg.inv)(x + 1024*jnp.eye(1024)); jax.block_until_ready(Minv)
print(f"[2] linalg.inv {time.perf_counter()-t0:.1f}s", flush=True)

t0=time.perf_counter()
w = jax.jit(jnp.linalg.eigvalsh)(x + x.T); jax.block_until_ready(w)
print(f"[3] eigvalsh {time.perf_counter()-t0:.1f}s", flush=True)

from optimal_control_problem_tpu.solvers.admm import ADMMSettings
from optimal_control_problem_tpu.solvers.admm_batched import admm_solve_shared
st = ADMMSettings(method="condensed", adaptive_rho=False, max_iter=500)
n, m, B = 24, 32, 64
rng = np.random.default_rng(0)
L = rng.normal(size=(n,n)); P = (L@L.T + np.eye(n)).astype(np.float32)
A = rng.normal(size=(m,n)).astype(np.float32)
q = rng.normal(size=(B,n)).astype(np.float32)
l = np.full((B,m), -1.0, np.float32); u = np.full((B,m), 1.0, np.float32)
t0=time.perf_counter()
sol = admm_solve_shared(jnp.asarray(P), jnp.asarray(A), jnp.asarray(q), jnp.asarray(l), jnp.asarray(u), st)
jax.block_until_ready(sol.x)
print(f"[4] admm_solve_shared compile+run {time.perf_counter()-t0:.1f}s iters={int(sol.iters)}", flush=True)
t0=time.perf_counter()
sol = admm_solve_shared(jnp.asarray(P), jnp.asarray(A), jnp.asarray(q), jnp.asarray(l), jnp.asarray(u), st)
jax.block_until_ready(sol.x)
print(f"[5] admm_solve_shared warm {1e3*(time.perf_counter()-t0):.1f}ms", flush=True)
