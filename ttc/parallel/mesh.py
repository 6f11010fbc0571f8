"""Device mesh construction and sharding helpers.

The reference has no distributed runtime at all — its unit of parallelism
is the tile, sharded across EC2 instances by shell scripts
(reference: plantations_job.sh:1-33, src/check_on_instances.py:1-159).

TPU-native replacement: a jax.sharding.Mesh over the slice with one data
axis ("tiles"). Tiles — or window batches, or training examples — are
sharded over that axis; model parameters are replicated; XLA inserts the
collectives (psum for gradient reduction) over ICI.

A second "model" axis is provisioned for spatial tensor parallelism of
very large window batches (kept size 1 by default: the model easily fits
one chip, so pure data parallelism is the speed-of-light layout here).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, model_axis: int = 1) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"asked for {n} devices, have {len(devices)}")
    grid = np.array(devices[:n]).reshape(n // model_axis, model_axis)
    return Mesh(grid, ("tiles", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-leading arrays sharded over the tiles axis."""
    return NamedSharding(mesh, P("tiles"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of batch-leading arrays with the batch axis
    sharded over the mesh's tiles axis."""
    sharding = data_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)
