"""Multi-host startup path: ``initialize_distributed`` smoke test.

The only ``parallel/`` entry point the virtual 8-device CPU mesh cannot
exercise is the multi-host/DCN startup wrapper (``parallel/mesh.py``),
because ``jax.distributed.initialize`` wires real processes together.
This test spawns TWO fresh CPU-only Python processes that each call
``initialize_distributed`` against a shared coordinator, build a global
2-device mesh over the DCN (process) axis, and run one ``psum`` — the
minimal end-to-end proof that the startup path produces a working
cross-process collective mesh.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)  # 1 local device per process
import jax
jax.config.update("jax_platforms", "cpu")

from optimal_control_problem_tpu.parallel import initialize_distributed

coord = sys.argv[1]
pid = int(sys.argv[2])
initialize_distributed(
    coordinator_address=coord, num_processes=2, process_id=pid
)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 2, jax.devices()  # global = both processes

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from optimal_control_problem_tpu.parallel import make_mesh

mesh = make_mesh(("dcn",))  # one axis over both processes' devices


def summed(x):
    return jax.lax.psum(x, "dcn")


out = jax.jit(
    jax.shard_map(
        summed, mesh=mesh, in_specs=P("dcn"), out_specs=P(None)
    )
)(jnp.arange(2, dtype=jnp.float32).reshape(2, 1) + 1.0)
# Each device holds one row; psum -> 1 + 2 = 3 everywhere.
local = jax.device_get(out.addressable_shards[0].data)
assert float(local.reshape(-1)[0]) == 3.0, local
print(f"proc {pid} ok", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_init(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""  # skip sitecustomize TPU registration
    env.pop("XLA_FLAGS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, coord, str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=repo,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid} ok" in out, out
