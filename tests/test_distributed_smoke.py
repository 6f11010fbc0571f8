"""Two-process jax.distributed smoke tests (localhost, CPU backend) —
the executable backing for docs/deploy.md's multi-host deployment
recipe: coordinator bring-up, global device visibility, a cross-process
sharded reduction, and a data-parallel tile predict over the DCN-style
mesh whose rasters are bit-equal to the single-process run."""
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


PREDICT_WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
addr, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(coordinator_address=addr, num_processes=2,
                           process_id=pid)
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ttc.core.config import InferenceConfig
from ttc.infer.pipeline import predict_tile
from ttc.models.unet import TreeCoverNet

cfg = InferenceConfig(tile_px=56, out_size=22, n_rows=2)
hw = cfg.tile_px
model = TreeCoverNet()
params = jax.jit(model.init, backend="cpu")(
    jax.random.PRNGKey(0), np.zeros((1, 5, 28, 28, 17), np.float32))

# both processes synthesize BOTH tiles deterministically; each
# contributes its own tile to the global batch
rng = np.random.default_rng(7)
batch = {
    "s2": (rng.random((2, 12, hw, hw, 14)) * 0.4).astype(np.float32),
    "s1": (rng.random((2, 12, hw, hw, 2)) * 0.6).astype(np.float32),
    "dem": (rng.random((2, hw, hw)) * 0.3).astype(np.float32),
    "s2m": (rng.random((2, hw, hw, 14)) * 0.4).astype(np.float32),
    "s1m": (rng.random((2, hw, hw, 2)) * 0.6).astype(np.float32),
    "clear": np.full((2, hw, hw), 8.0, np.float32),
}
order = ("s2", "s1", "dem", "s2m", "s1m", "clear")

devs = np.array(jax.devices())
mesh = Mesh(devs, ("tiles",))
data = NamedSharding(mesh, P("tiles"))
repl = NamedSharding(mesh, P())
global_args = [jax.make_array_from_process_local_data(
    data, batch[k][pid:pid + 1]) for k in order]

batched = jax.jit(
    jax.vmap(lambda a, b, c, d, e, f: predict_tile(
        params, a, b, c, d, e, f, model=model, cfg=cfg)),
    out_shardings=repl)
rasters = batched(*global_args)
mine = np.asarray(
    [s.data for s in rasters.addressable_shards][0])  # full (replicated)

# single-process reference over both tiles on the local device
ref = np.asarray(jax.jit(jax.vmap(
    lambda a, b, c, d, e, f: predict_tile(
        params, a, b, c, d, e, f, model=model, cfg=cfg)))(
    *[batch[k] for k in order]))
assert mine.shape == ref.shape == (2, hw, hw), (mine.shape, ref.shape)
np.testing.assert_array_equal(mine, ref)
print("PREDICT_OK", int(mine.astype(np.int64).sum()), flush=True)
"""


@pytest.mark.slow
def test_two_process_data_parallel_predict(tmp_path):
    """docs/deploy.md multi-host section: 2 processes, one device
    each, tiles sharded over the DCN mesh; the globally-sharded
    predict must produce rasters bit-equal to a single-process run."""
    addr = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, "-c", PREDICT_WORKER, addr, str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=env, cwd=str(tmp_path))
        for pid in (0, 1)]
    sums = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"rc={p.returncode}\n{err[-3000:]}"
        assert "PREDICT_OK" in out, out
        sums.append(out.split("PREDICT_OK")[1].split()[0])
    assert sums[0] == sums[1], sums
