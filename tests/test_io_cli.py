"""IO codecs, tile store, and CLI-level integration."""
import os

import numpy as np
import pytest

from ttc.io.arrays import load_array, save_array
from ttc.io.geotiff import read_geotiff, write_geotiff, write_tree_cover_tif
from ttc.io.store import TileStore


def test_geotiff_roundtrip_uint8(tmp_path, rng):
    arr = (rng.random((50, 60)) * 100).astype(np.uint8)
    bbox = (10.0, -5.0, 10.6, -4.4)
    path = str(tmp_path / "t.tif")
    write_geotiff(path, arr, bbox, nodata=255)
    back, bbox2 = read_geotiff(path)
    np.testing.assert_array_equal(back[..., 0], arr)
    np.testing.assert_allclose(bbox2, bbox, atol=1e-9)


def test_geotiff_roundtrip_multiband_float(tmp_path, rng):
    arr = rng.random((30, 30, 5)).astype(np.float32)
    path = str(tmp_path / "mb.tif")
    write_geotiff(path, arr, (0, 0, 1, 1))
    back, _ = read_geotiff(path)
    np.testing.assert_array_equal(back, arr)


def test_geotiff_roundtrip_int16(tmp_path, rng):
    arr = (rng.normal(0, 1000, (20, 25))).astype(np.int16)
    path = str(tmp_path / "i16.tif")
    write_geotiff(path, arr, (0, 0, 1, 1), compress=False)
    back, _ = read_geotiff(path)
    np.testing.assert_array_equal(back[..., 0], arr)


def test_tree_cover_tif(tmp_path):
    preds = np.full((20, 20), 42, np.uint8)
    preds[0, 0] = 255
    path = str(tmp_path / "tc.tif")
    write_tree_cover_tif(path, preds, (0, 0, 1, 1))
    back, _ = read_geotiff(path)
    np.testing.assert_array_equal(back[..., 0], preds)


def test_h5_array_roundtrip(tmp_path, rng):
    arr = (rng.random((4, 10, 10, 3)) * 1000).astype(np.int16)
    path = str(tmp_path / "a.h5")
    save_array(path, arr)
    np.testing.assert_array_equal(load_array(path), arr)


def test_tile_store_layout(tmp_path):
    store = TileStore(str(tmp_path))
    base = store.make_tile_folders(3, 7)
    for sub in ("clouds", "misc", "s1", "s2_10", "s2_20"):
        assert os.path.isdir(os.path.join(base, "raw", sub))
    assert not store.tile_done(2023, 3, 7)
    # touching the final tif marks it done
    open(store.final_tif_path(3, 7), "w").close()
    assert store.tile_done(2023, 3, 7)
    assert store.s3_key(2023, "tiles", 3, 7, "a.tif") \
        == "2023/tiles/3/7/a.tif"


def test_fleet_shard_ranges():
    from ttc.cli.fleet import shard_ranges

    ranges = shard_ranges(10, 3)
    assert ranges == [(0, 4), (4, 8), (8, 10)]
    covered = sorted(i for a, b in ranges for i in range(a, b))
    assert covered == list(range(10))


@pytest.mark.slow
def test_predict_job_end_to_end(tmp_path):
    """Full CLI path on the fixture backend with a small geometry."""
    import jax

    from ttc.cli.predict_job import run_tile
    from ttc.core.config import InferenceConfig
    from ttc.infer.pipeline import TilePredictor
    from ttc.io.acquisition import FixtureBackend
    from ttc.models.unet import TreeCoverNet

    model = TreeCoverNet()
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), np.zeros((1, 5, 28, 28, 17), np.float32))
    cfg = InferenceConfig(tile_px=110, out_size=66, n_rows=3)
    predictor = TilePredictor(params, cfg, model)
    store = TileStore(str(tmp_path))
    backend = FixtureBackend(seed=3, n_dates=8, hw=110)

    raster = run_tile(5, 9, 2023, backend, store, predictor)
    assert raster.shape == (110, 110)
    assert os.path.exists(store.final_tif_path(5, 9))
    assert os.path.exists(os.path.join(store.tile_dir(5, 9),
                                       "ard_ndmi.h5"))
    back, _ = read_geotiff(store.final_tif_path(5, 9))
    np.testing.assert_array_equal(back[..., 0], np.asarray(raster))


@pytest.mark.slow
def test_predict_job_pipelined(tmp_path):
    import jax

    from ttc.cli.predict_job import run_tiles_pipelined
    from ttc.core.config import InferenceConfig
    from ttc.infer.pipeline import TilePredictor
    from ttc.io.acquisition import FixtureBackend
    from ttc.models.unet import TreeCoverNet

    model = TreeCoverNet()
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), np.zeros((1, 5, 28, 28, 17), np.float32))
    cfg = InferenceConfig(tile_px=110, out_size=66, n_rows=3)
    predictor = TilePredictor(params, cfg, model)
    store = TileStore(str(tmp_path))
    backend = FixtureBackend(seed=4, n_dates=8, hw=110)

    results = run_tiles_pipelined([(1, 1), (1, 2), (2, 1)], 2023,
                                  backend, store, predictor)
    assert len(results) == 3
    for (x, y), raster in results.items():
        assert raster.shape == (110, 110)
        assert os.path.exists(store.final_tif_path(x, y))


@pytest.mark.slow
def test_predict_job_pipelined_tile_batch(tmp_path):
    """tile_batch=2 pipelined mode (one device call per tile pair,
    odd tail padded) must write the same rasters as per-tile calls."""
    import jax

    from ttc.cli.predict_job import run_tiles_pipelined
    from ttc.core.config import InferenceConfig
    from ttc.infer.pipeline import TilePredictor
    from ttc.io.acquisition import FixtureBackend
    from ttc.models.unet import TreeCoverNet

    model = TreeCoverNet()
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), np.zeros((1, 5, 28, 28, 17), np.float32))
    cfg = InferenceConfig(tile_px=110, out_size=66, n_rows=3)
    backend = FixtureBackend(seed=6, n_dates=8, hw=110)
    tiles = [(1, 1), (1, 2), (2, 1)]          # odd count: tail pad

    single = TilePredictor(params, cfg, model)
    store_a = TileStore(str(tmp_path / "a"))
    ref = run_tiles_pipelined(tiles, 2023, backend, store_a, single)

    paired = TilePredictor(params, cfg, model, tile_batch=2)
    store_b = TileStore(str(tmp_path / "b"))
    got = run_tiles_pipelined(tiles, 2023, backend, store_b, paired)

    assert set(got) == set(ref) == set(tiles)
    for xy in tiles:
        np.testing.assert_array_equal(np.asarray(ref[xy]),
                                      np.asarray(got[xy]), err_msg=str(xy))
        assert os.path.exists(store_b.final_tif_path(*xy))


@pytest.mark.slow
def test_predict_job_pipelined_failure_containment(tmp_path,
                                                   monkeypatch):
    """Failures are contained per kind: a fetch/prep failure drops only
    the failed tile (already-prepared groupmates stay queued for the
    next flush); a device-side group failure abandons exactly that
    group and later groups realign to the compiled batch size."""
    import jax

    import ttc.cli.predict_job as pj
    from ttc.core.config import InferenceConfig
    from ttc.infer.pipeline import TilePredictor
    from ttc.io.acquisition import FixtureBackend
    from ttc.models.unet import TreeCoverNet

    monkeypatch.setattr(pj.time, "sleep", lambda s: None)
    model = TreeCoverNet()
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), np.zeros((1, 5, 28, 28, 17), np.float32))
    cfg = InferenceConfig(tile_px=110, out_size=66, n_rows=3)
    paired = TilePredictor(params, cfg, model, tile_batch=2)
    tiles = [(1, 1), (1, 2), (2, 1), (2, 2), (3, 1)]

    class FailingFetch(FixtureBackend):
        def fetch(self, x, y, bbox, year):
            if (x, y) == (1, 2):
                raise RuntimeError("injected fetch failure")
            return super().fetch(x, y, bbox, year)

    backend = FailingFetch(seed=6, n_dates=8, hw=110)
    store = TileStore(str(tmp_path / "fetch"))
    got = pj.run_tiles_pipelined(tiles, 2023, backend, store, paired)
    assert sorted(got) == [(1, 1), (2, 1), (2, 2), (3, 1)]

    # device-side failure: poison exactly one group flush
    # (_finish_group imports from ttc.preprocess.ard, so patch there)
    import ttc.preprocess.ard as ard_mod

    backend_ok = FixtureBackend(seed=6, n_dates=8, hw=110)
    store_b = TileStore(str(tmp_path / "group"))
    real = ard_mod.process_and_smooth_tiles
    calls = {"n": 0}

    def poisoned(*a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected group failure")
        return real(*a, **k)

    monkeypatch.setattr(ard_mod, "process_and_smooth_tiles", poisoned)
    got_b = pj.run_tiles_pipelined(tiles, 2023, backend_ok, store_b,
                                   paired)
    # first group (2 tiles) abandoned; remaining 3 complete (2 + tail)
    assert sorted(got_b) == [(2, 1), (2, 2), (3, 1)]
    assert calls["n"] == 3


@pytest.mark.slow
def test_predict_job_blocked(tmp_path):
    """--block 2: complete 2x2 groups predict as one shared-halo
    super-tile; leftovers fall back to per-tile. All outputs written."""
    import jax

    from ttc.cli.predict_job import run_tiles_blocked
    from ttc.core.config import InferenceConfig
    from ttc.infer.pipeline import TilePredictor
    from ttc.io.acquisition import FixtureBackend
    from ttc.models.unet import TreeCoverNet

    model = TreeCoverNet()
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), np.zeros((1, 5, 28, 28, 17), np.float32))
    cfg = InferenceConfig(tile_px=110, out_size=66, n_rows=3)
    predictor = TilePredictor(params, cfg, model)
    store = TileStore(str(tmp_path))
    backend = FixtureBackend(seed=9, n_dates=8, hw=110)

    tiles = [(4, 4), (5, 4), (4, 5), (5, 5), (9, 9)]  # block + single
    results = run_tiles_blocked(tiles, 2023, backend, store, predictor)
    assert set(results) == set(tiles)
    for x, y in tiles:
        assert results[(x, y)].shape == (110, 110)
        assert os.path.exists(store.final_tif_path(x, y))


@pytest.mark.slow
def test_predict_job_blocked_sharded(tmp_path):
    """--block 2 --block_sharded: the super-tile runs SPMD over the
    largest compatible subset of the virtual mesh (strip sharding +
    halo exchange) and still writes every raster."""
    import jax

    from ttc.cli.predict_job import run_tiles_blocked
    from ttc.core.config import InferenceConfig
    from ttc.infer.pipeline import TilePredictor
    from ttc.io.acquisition import FixtureBackend
    from ttc.models.unet import TreeCoverNet

    model = TreeCoverNet()
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), np.zeros((1, 5, 28, 28, 17), np.float32))
    cfg = InferenceConfig(tile_px=110, out_size=66, n_rows=3)
    predictor = TilePredictor(params, cfg, model)
    store = TileStore(str(tmp_path))
    backend = FixtureBackend(seed=9, n_dates=8, hw=110)

    tiles = [(4, 4), (5, 4), (4, 5), (5, 5)]
    results = run_tiles_blocked(tiles, 2023, backend, store, predictor,
                                sharded=True)
    assert set(results) == set(tiles)
    for x, y in tiles:
        assert results[(x, y)].shape == (110, 110)
        assert os.path.exists(store.final_tif_path(x, y))
