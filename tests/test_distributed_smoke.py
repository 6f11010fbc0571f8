"""Two-process jax.distributed smoke test (localhost, CPU backend) —
the executable backing for docs/deploy.md's multi-host deployment
recipe: coordinator bring-up, global device visibility, a cross-process
sharded reduction."""
import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
addr, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(coordinator_address=addr, num_processes=2,
                           process_id=pid)
assert jax.process_count() == 2, jax.process_count()
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

devs = np.array(jax.devices())           # global: one per process
assert devs.size == 2, devs
mesh = Mesh(devs, ("d",))
local = np.full((4,), pid + 1.0, np.float32)
arr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("d")), local)
total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
print("TOTAL", float(total), flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_psum(tmp_path):
    addr = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)           # one CPU device per process
    procs = [subprocess.Popen(
        [sys.executable, "-c", WORKER, addr, str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=env, cwd=str(tmp_path))
        for pid in (0, 1)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"rc={p.returncode}\n{err[-2000:]}"
        outs.append(out)
    # 4 ones + 4 twos across the two processes
    for out in outs:
        assert "TOTAL 12.0" in out, out
