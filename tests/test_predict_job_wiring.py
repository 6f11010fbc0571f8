"""predict_job wiring: georeferencing from the tile DB, trained-weight
guard, npz release format, slope persistence, and the change-job
consumption of those artifacts."""
import os

import numpy as np
import pytest

from ttc.io.geotiff import read_geotiff


def test_tile_bbox_from_db_row():
    from ttc.cli.predict_job import tile_bbox

    row = {"X": 30.5, "Y": -2.25}
    bbox = tile_bbox(row)
    # expansion of 10 units of 1/360 deg on each side
    # (reference: download_and_predict_job.py:1925 expansion=300/30)
    assert bbox is not None
    np.testing.assert_allclose(bbox[0], 30.5 - 10 / 360.0)
    np.testing.assert_allclose(bbox[3], -2.25 + 10 / 360.0)
    assert tile_bbox({"X": float("nan"), "Y": 1.0}) is None
    assert tile_bbox({}) is None


def test_build_model_params_guards(tmp_path, monkeypatch):
    import ttc.cli.predict_job as pj

    # explicit but missing path is an error
    with pytest.raises(FileNotFoundError):
        pj.build_model_params(str(tmp_path / "nope.npz"))

    # no path + no bundled weights: random init must be opt-in
    monkeypatch.setattr(pj, "DEFAULT_WEIGHTS",
                        str(tmp_path / "absent.npz"))
    with pytest.raises(FileNotFoundError):
        pj.build_model_params(None)
    model, params = pj.build_model_params(None, allow_random_init=True)
    assert params is not None


def test_params_npz_roundtrip(tmp_path):
    import jax

    from ttc.models.unet import TreeCoverNet
    from ttc.train.checkpoint import load_params_npz, save_params_npz

    model = TreeCoverNet()
    params = jax.jit(model.init)(
        jax.random.PRNGKey(1), np.zeros((1, 5, 28, 28, 17), np.float32))
    path = str(tmp_path / "w.npz")
    save_params_npz(path, params)
    back = load_params_npz(path)

    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(back)[0]
    assert len(flat_a) == len(flat_b)
    for (pa, la), (pb, lb) in zip(flat_a, flat_b):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


@pytest.mark.slow
def test_main_writes_georeferenced_tif_and_slope(tmp_path):
    """Full CLI main(): DB-driven bbox in the tif transform, dem.npy
    persisted for the change job."""
    import pandas as pd

    from ttc.cli import predict_job

    db = tmp_path / "tiles.csv"
    pd.DataFrame({"X_tile": [7], "Y_tile": [3],
                  "X": [29.75], "Y": [-1.5]}).to_csv(db, index=False)
    out = tmp_path / "tiles"
    predict_job.main([
        "--db_path", str(db), "--local_path", str(out),
        "--year", "2023", "--backend", "forest",
        "--tile_px", "110", "--out_size", "66", "--n_rows", "3",
        "--allow_random_init", "--no_superres",
    ])

    tif = os.path.join(str(out), "7", "3", "7X3Y_FINAL.tif")
    assert os.path.exists(tif)
    arr, bbox = read_geotiff(tif)
    assert arr.shape[:2] == (110, 110)
    # georeference: the DB point expanded by 10 * 1/360 deg per side
    np.testing.assert_allclose(bbox[0], 29.75 - 10 / 360.0, atol=1e-7)
    np.testing.assert_allclose(bbox[3], -1.5 + 10 / 360.0, atol=1e-7)

    dem = os.path.join(str(out), "7", "3", "dem.npy")
    assert os.path.exists(dem)
    slope = np.load(dem)
    assert slope.shape == (110, 110)
    assert slope.max() > 1.0  # degrees, hilly fixture — not zeros


def test_change_job_loads_persisted_slope(tmp_path):
    from ttc.cli.change_job import load_slope

    d = tmp_path / "2021" / "4" / "5"
    os.makedirs(d)
    np.save(d / "dem.npy", np.full((20, 20), 7.0, np.float32))
    slope = load_slope(str(tmp_path), 4, 5, 2019, 2022, (20, 20))
    np.testing.assert_array_equal(slope, 7.0)
    # absent -> zeros fallback
    z = load_slope(str(tmp_path), 9, 9, 2019, 2022, (20, 20))
    np.testing.assert_array_equal(z, 0.0)


def test_build_change_raster_encoding():
    from ttc.change.pipeline import build_change_raster

    n_years, hw = 6, 40
    fs = np.full((n_years, hw, hw), 80.0, np.float32)
    gain = np.zeros((hw, hw), np.uint8)
    loss = np.zeros((hw, hw), np.uint8)
    nans = np.zeros((n_years, hw, hw), bool)

    # a real loss event in year 2 (index 2): trees -> partial in the
    # loss year (>=40 so the reference's prior-notree / unstable rules
    # don't fire) -> bare after
    fs[2, 5:10, 5:10] = 45.0
    fs[3:, 5:10, 5:10] = 5.0
    loss[5:10, 5:10] = 2
    # an unstable loss in year 2 that reverts to trees immediately
    fs[2, 20:25, 20:25] = 5.0
    loss[20:25, 20:25] = 2
    # a gain event
    fs[:3, 30:35, 30:35] = 5.0
    gain[30:35, 30:35] = 3

    med = build_change_raster(fs, gain, loss, nans)
    assert np.all(med[5:10, 5:10] == 202)      # loss kept: year+200
    assert np.all(med[30:35, 30:35] == 103)    # gain: year+100
    # unstable loss reverted to the median tree cover
    assert np.all(med[20:25, 20:25] != 202)
