"""Regenerate the frozen end-to-end golden fixture
(tests/fixtures_golden_raster.npz) from the release weights.

Run deliberately when a change is SUPPOSED to alter pipeline outputs
(new weights, intentional behavior change) — document why in the
commit message.

    python tools/make_golden.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# Match tests/conftest.py exactly: the virtual 8-device CPU backend
# partitions fp32 reductions differently from a 1-device backend, so
# the golden must be generated under the same configuration the tests
# run with.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from ttc.core.config import InferenceConfig  # noqa: E402
from ttc.infer.pipeline import TilePredictor  # noqa: E402
from ttc.io.forest import ForestFixtureBackend  # noqa: E402
from ttc.models.unet import TreeCoverNet  # noqa: E402
from ttc.preprocess.ard import process_tile, smooth_tile  # noqa: E402
from ttc.train.checkpoint import load_params_npz  # noqa: E402

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(HERE, "tests", "fixtures_golden_raster.npz")
WEIGHTS = os.path.join(HERE, "weights", "treecover.npz")


def main():
    params = load_params_npz(WEIGHTS)
    cfg = InferenceConfig(tile_px=110, out_size=66, n_rows=3)
    predictor = TilePredictor(params, cfg, TreeCoverNet())
    backend = ForestFixtureBackend(seed=11, n_dates=9, hw=110)

    raw = backend.fetch(2, 3, None, 2023)
    canopy = backend.canopy(2, 3)
    tile = process_tile(raw)
    sm = smooth_tile(tile)
    raster = np.asarray(predictor(
        sm.s2, sm.s1, sm.dem, sm.s2_median, sm.s1_median,
        sm.clear_count))
    valid = raster != 255
    dev = float(np.abs(raster[valid].astype(np.float32)
                       - canopy[valid] * 100).mean())
    np.savez_compressed(
        GOLDEN, raster=raster, dates=tile.dates,
        s2_monthly_mean=sm.s2.mean(axis=(1, 2)),
        canopy=canopy, deviation_pp=dev,
        # per-stage summaries: localize drift to masking, gap-fill,
        # or smoothing instead of only catching it at the raster
        mask_frac=np.asarray(tile.cloudshad).mean(axis=(1, 2)),
        interp_frac=np.asarray(tile.interp > 0).mean(axis=(1, 2)),
        s2_filled_mean=np.asarray(tile.s2).mean(axis=(1, 2, 3)),
        s2_median_mean=np.asarray(sm.s2_median).mean(axis=(0, 1)),
        s1_median_mean=np.asarray(sm.s1_median).mean(axis=(0, 1)),
        clear_count_mean=float(np.asarray(sm.clear_count).mean()),
        snow_mean=float(np.asarray(tile.snow).mean()))
    print(f"golden written: raster mean {raster[valid].mean():.1f}, "
          f"deviation vs truth {dev:.2f} pp")


if __name__ == "__main__":
    main()
