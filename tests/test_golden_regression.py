"""Frozen end-to-end regression: the fixture tile must reproduce the
recorded raster exactly (CPU, fixed seeds, RELEASE WEIGHTS). Guards the
whole chain — fixture backend, ARD assembly, masking, gap-fill,
smoothing, windows, model, mosaic — against silent behavioral drift
between rounds, and asserts the recorded accuracy vs the scene's
ground-truth canopy.

Regenerate with tools/make_golden.py when a change is *supposed* to
alter outputs (document why in the commit).
"""
import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__),
                      "fixtures_golden_raster.npz")
WEIGHTS = os.path.join(os.path.dirname(__file__), "..", "weights",
                       "treecover.npz")

pytestmark = pytest.mark.skipif(
    not (os.path.exists(GOLDEN) and os.path.exists(WEIGHTS)),
    reason="golden fixture / release weights missing")


@pytest.mark.slow
def test_end_to_end_matches_golden():
    from ttc.core.config import InferenceConfig
    from ttc.infer.pipeline import TilePredictor
    from ttc.io.forest import ForestFixtureBackend
    from ttc.models.unet import TreeCoverNet
    from ttc.preprocess.ard import process_tile, smooth_tile
    from ttc.train.checkpoint import load_params_npz

    golden = np.load(GOLDEN)

    params = load_params_npz(WEIGHTS)
    cfg = InferenceConfig(tile_px=110, out_size=66, n_rows=3)
    predictor = TilePredictor(params, cfg, TreeCoverNet())
    backend = ForestFixtureBackend(seed=11, n_dates=9, hw=110)

    raw = backend.fetch(2, 3, None, 2023)
    tile = process_tile(raw)
    np.testing.assert_array_equal(tile.dates, golden["dates"])
    sm = smooth_tile(tile)
    np.testing.assert_allclose(sm.s2.mean(axis=(1, 2)),
                               golden["s2_monthly_mean"],
                               rtol=1e-5, atol=1e-6)
    raster = np.asarray(predictor(
        sm.s2, sm.s1, sm.dem, sm.s2_median, sm.s1_median,
        sm.clear_count))
    mismatch = np.mean(raster != golden["raster"])
    # allow <=0.5% single-level quantization flips from compiler /
    # library version changes; anything more is real drift
    assert mismatch <= 0.005, f"raster drift: {mismatch:.4%}"
    if mismatch:
        assert np.abs(raster.astype(int)
                      - golden["raster"].astype(int)).max() <= 1

    # accuracy vs the scene's ground-truth canopy: the recorded
    # deviation (release-weight quality bar) must not regress
    canopy = golden["canopy"] * 100.0
    valid = raster != 255
    dev = np.abs(raster[valid].astype(np.float32)
                 - canopy[valid]).mean()
    assert dev <= float(golden["deviation_pp"]) + 0.5, \
        f"accuracy regressed: {dev:.2f} pp vs recorded " \
        f"{float(golden['deviation_pp']):.2f} pp"
