"""Flagship benchmark: full-tile tree-cover inference throughput.

Measures the complete jitted per-tile program — quarterly medians,
window extraction, normalization, 36-window ConvGRU U-Net forward,
bright-surface masking, Gaussian mosaic — at production geometry
(618x618 px, 12 monthly steps), the work the reference does serially on
CPU per 6x6 km tile (reference: src/download_and_predict_job.py:1125-1641).

Prints one JSON line:
  {"metric": ..., "value": tiles/sec, "unit": "tiles/sec/chip",
   "vs_baseline": speedup vs the recorded reference-equivalent CPU run}
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

# Reference-equivalent CPU throughput (tiles/sec) measured on this host
# via `python bench.py --cpu-baseline` (single CPU process running the
# same full-tile program). Update by re-running with that flag.
CPU_BASELINE_FILE = os.path.join(os.path.dirname(__file__),
                                 "BASELINE_LOCAL.json")


def _build_inputs(rng, hw=618):
    return dict(
        s2_monthly=rng.random((12, hw, hw, 14), np.float32) * 0.4,
        s1_monthly=rng.random((12, hw, hw, 2), np.float32) * 0.6,
        slope=rng.random((hw, hw), np.float32) * 0.3,
        s2_median=rng.random((hw, hw, 14), np.float32) * 0.4,
        s1_median=rng.random((hw, hw, 2), np.float32) * 0.6,
        clear_count=np.full((hw, hw), 8.0, np.float32),
    )


def run(n_iters: int = 8, warmup: int = 2, tile_batch: int = 2):
    import jax

    from ttc.core.config import InferenceConfig
    from ttc.infer.pipeline import TilePredictor
    from ttc.models.unet import TreeCoverNet

    model = TreeCoverNet()
    rng = np.random.default_rng(0)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        np.zeros((1, 5, 28, 28, 17), np.float32))

    predictor = TilePredictor(params, InferenceConfig(), model,
                              tile_batch=tile_batch)
    inputs = _build_inputs(rng)
    args = tuple(
        np.stack([inputs[k]] * tile_batch) if tile_batch > 1
        else inputs[k]
        for k in ("s2_monthly", "s1_monthly", "slope", "s2_median",
                  "s1_median", "clear_count"))
    args = jax.device_put(args)

    # NB: on the axon backend block_until_ready() returns before remote
    # execution finishes — force completion with a host readback.
    for _ in range(warmup):
        out = predictor(*args)
    np.asarray(out)

    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = predictor(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / (n_iters * tile_batch)
    return 1.0 / dt, dt


def main():
    import sys

    if "--cpu-baseline" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
        tps, dt = run(n_iters=2, warmup=1)
        with open(CPU_BASELINE_FILE, "w") as f:
            json.dump({"cpu_tiles_per_sec": tps,
                       "seconds_per_tile": dt}, f)
        print(json.dumps({"metric": "cpu-baseline tiles/sec",
                          "value": round(tps, 4), "unit": "tiles/sec"}))
        return

    tps, dt = run()

    vs_baseline = None
    if os.path.exists(CPU_BASELINE_FILE):
        with open(CPU_BASELINE_FILE) as f:
            cpu = json.load(f)["cpu_tiles_per_sec"]
        vs_baseline = round(tps / cpu, 2)

    print(json.dumps({
        "metric": "full-tile inference (618px, 12-step, 36-window "
                  "ConvGRU U-Net + mosaic)",
        "value": round(tps, 4),
        "unit": "tiles/sec/chip",
        "vs_baseline": vs_baseline,
    }))


if __name__ == "__main__":
    main()
