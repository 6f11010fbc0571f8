"""Multi-tile batched inference over a device mesh.

The country-scale deployment path (BASELINE configs 3 and 5): a batch
of smoothed tiles is sharded over the mesh's "tiles" axis, the whole
predict program runs SPMD (parameters replicated, no collectives
needed — tiles are independent), and the host overlaps acquisition of
the next batch with device compute via a simple double-buffered queue.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ttc.core.config import InferenceConfig
from ttc.infer.pipeline import predict_tile
from ttc.models.unet import TreeCoverNet


def make_batched_predictor(params, mesh: Mesh,
                           cfg: InferenceConfig | None = None,
                           model: TreeCoverNet | None = None):
    """Returns fn(batch_dict) -> (B, H, W) uint8 rasters, with the
    leading tile axis sharded over the mesh."""
    cfg = cfg or InferenceConfig()
    model = model or TreeCoverNet()

    def _one(s2, s1, slope, s2_med, s1_med, clear):
        return predict_tile(params, s2, s1, slope, s2_med, s1_med,
                            clear, model=model, cfg=cfg)

    batched = jax.vmap(_one)
    data = NamedSharding(mesh, P("tiles"))

    @jax.jit
    def run(batch):
        return batched(batch["s2_monthly"], batch["s1_monthly"],
                       batch["slope"], batch["s2_median"],
                       batch["s1_median"], batch["clear_count"])

    def predict_batch(batch):
        placed = {k: jax.device_put(jnp.asarray(v), data)
                  for k, v in batch.items()}
        return run(placed)

    return predict_batch


def prefetched(batches: Iterable, depth: int = 2) -> Iterator:
    """Host-side prefetch: a background thread keeps `depth` batches
    ready while the device computes — the replacement for the
    reference's serial download-then-process loop."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    sentinel = object()

    def worker():
        try:
            for item in batches:
                q.put(item)
        finally:
            q.put(sentinel)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        yield item


def run_tile_stream(params, mesh: Mesh, tile_iter: Iterable,
                    cfg: InferenceConfig | None = None,
                    batch_size: int | None = None):
    """Stream (tile_id, smoothed-input dict) pairs through the mesh in
    sharded batches; yields (tile_ids, rasters)."""
    cfg = cfg or InferenceConfig()
    batch_size = batch_size or mesh.devices.size
    predictor = make_batched_predictor(params, mesh, cfg)

    def batcher():
        ids, bufs = [], []
        for tile_id, inputs in tile_iter:
            ids.append(tile_id)
            bufs.append(inputs)
            if len(ids) == batch_size:
                yield ids, bufs
                ids, bufs = [], []
        if ids:
            # pad the final batch to full size for shape stability
            while len(bufs) < batch_size:
                bufs.append(bufs[-1])
                ids.append(None)
            yield ids, bufs

    for ids, bufs in prefetched(batcher()):
        batch = {k: np.stack([b[k] for b in bufs])
                 for k in bufs[0]}
        rasters = np.asarray(predictor(batch))
        yield ids, rasters
