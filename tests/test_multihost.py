"""Multi-host bring-up: `initialize_distributed` (parallel/mesh.py, the
torchrun env:// replacement) exercised for real with two local CPU
processes rendezvousing through a coordinator and running a cross-process
collective — round 1 shipped this as dead untested code."""

import os
import socket
import subprocess
import sys

import pytest

_CHILD = r"""
import sys
import jax

jax.config.update("jax_platforms", "cpu")

coordinator, pid = sys.argv[1], int(sys.argv[2])
from lr2ppo_tpu.parallel.mesh import initialize_distributed

initialize_distributed(coordinator=coordinator, num_processes=2,
                       process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 2, jax.devices()          # global view
assert len(jax.local_devices()) == 1

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

mesh = Mesh(np.array(jax.devices()), ("dp",))
sh = NamedSharding(mesh, P("dp"))
# each process contributes its rank+1; the jitted global sum must see
# both shards -> 1 + 2 = 3 everywhere
x = jax.make_array_from_callback(
    (2,), sh, lambda idx: np.asarray([jax.process_index() + 1.0],
                                     np.float32))
total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(x)
assert float(total) == 3.0, float(total)
print(f"proc {pid} OK total={float(total)}")
"""


def _run_rendezvous(env):
    # bind-then-close port probing is a TOCTOU race on a shared host:
    # retry the whole rendezvous with a fresh port on failure
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _CHILD, coordinator, str(i)],
            env=env, cwd=os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)
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
    return procs, outs


@pytest.mark.slow
def test_two_process_distributed_initialize(tmp_path):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # one real device per process
    env["JAX_PLATFORMS"] = "cpu"
    for attempt in range(3):
        procs, outs = _run_rendezvous(env)
        if all(p.returncode == 0 for p in procs):
            break
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert "OK total=3.0" in out
