"""ARD-based seam re-prediction: store borders, repair a seam."""
import numpy as np
import pytest

import jax

from ttc.cli.predict_job import run_tile
from ttc.core.config import InferenceConfig
from ttc.infer.pipeline import TilePredictor
from ttc.infer.reseg import (
    ard_strip_predictor,
    load_border_strips,
    resegment_pair,
    save_border_strips,
)
from ttc.io.acquisition import FixtureBackend
from ttc.io.store import TileStore
from ttc.models.unet import TreeCoverNet
from ttc.preprocess.ard import process_tile, smooth_tile


@pytest.mark.slow
def test_border_strip_roundtrip_and_repredict(tmp_path):
    model = TreeCoverNet()
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), np.zeros((1, 5, 28, 28, 17), np.float32))
    store = TileStore(str(tmp_path))
    backend = FixtureBackend(seed=6, n_dates=8, hw=110)

    for x in (0, 1):
        raw = backend.fetch(x, 0, None, 2023)
        sm = smooth_tile(process_tile(raw))
        store.make_tile_folders(x, 0)
        save_border_strips(store, x, 0, sm, width=60)

    east = load_border_strips(store, 0, 0, "east")
    assert east is not None and east["s2"].shape[2] == 60

    fn = ard_strip_predictor(store, (0, 0), (1, 0), params,
                             direction="x", strip_width=40)
    assert fn is not None
    strip = fn()
    # contract: (tile_H, 2*strip_width), the innermost strip_width px
    # of each stored border
    assert strip.shape == (110, 80)
    assert np.isfinite(strip).all()
    assert fn.strip_width == 40

    # drive a full repair with artificial seam rasters
    left = np.full((110, 110), 30, np.uint8)
    right = np.full((110, 110), 75, np.uint8)
    l2, r2, repaired = resegment_pair(
        left, right, lambda: strip, strip_width=40)
    assert repaired


def test_missing_borders_returns_none(tmp_path):
    store = TileStore(str(tmp_path))
    assert load_border_strips(store, 9, 9, "east") is None
    assert ard_strip_predictor(store, (9, 9), (9, 10), None) is None
