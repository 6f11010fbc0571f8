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


@pytest.mark.slow
def test_feature_rasters_patched_seam_side_only(tmp_path):
    """*_feat parity: an accepted strip repair regenerates the 32-ch
    feature rasters over the strip and patches the stored feats
    seam-side only (reference resegment_tiles_wide_feat.py:530-545)."""
    import os

    from ttc.infer.reseg import regenerate_strip_features

    model = TreeCoverNet()
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), np.zeros((1, 5, 28, 28, 17), np.float32))
    store = TileStore(str(tmp_path))
    backend = FixtureBackend(seed=6, n_dates=8, hw=110)

    before = {}
    for x in (0, 1):
        raw = backend.fetch(x, 0, None, 2023)
        sm = smooth_tile(process_tile(raw))
        store.make_tile_folders(x, 0)
        save_border_strips(store, x, 0, sm, width=60)
        feats_dir = os.path.join(store.tile_dir(x, 0), "feats")
        os.makedirs(feats_dir, exist_ok=True)
        for name in ("early", "late"):
            arr = np.full((110, 110, 32), 7, np.int16)
            np.save(os.path.join(feats_dir, f"{name}.npy"), arr)
            before[(x, name)] = arr.copy()

    fn = ard_strip_predictor(store, (0, 0), (1, 0), params,
                             direction="x", strip_width=40)
    fn()  # run the strip predict (stashes model_inputs)
    assert regenerate_strip_features(fn, store, (0, 0), (1, 0),
                                     direction="x")

    for x, side in ((0, "left"), (1, "right")):
        for name in ("early", "late"):
            after = np.load(os.path.join(store.tile_dir(x, 0),
                                         "feats", f"{name}.npy"))
            sl_patch = (slice(None), slice(-40, None)) if side == "left" \
                else (slice(None), slice(0, 40))
            sl_rest = (slice(None), slice(0, -40)) if side == "left" \
                else (slice(None), slice(40, None))
            # seam-side strip changed, the rest untouched
            assert not np.array_equal(after[sl_patch],
                                      before[(x, name)][sl_patch])
            np.testing.assert_array_equal(after[sl_rest],
                                          before[(x, name)][sl_rest])


def test_regenerate_features_requires_inputs_and_feats(tmp_path):
    from ttc.infer.reseg import regenerate_strip_features

    store = TileStore(str(tmp_path))

    class NoInputs:
        pass

    assert not regenerate_strip_features(NoInputs(), store, (0, 0),
                                         (1, 0))
