"""End-to-end change job: synthetic multi-year artifacts -> gain/loss
rasters through the full CLI path (tif IO, KDE, detection, filtering)."""
import os

import numpy as np
import pytest

from ttc.cli.change_job import run_change
from ttc.io.arrays import save_array
from ttc.io.geotiff import write_tree_cover_tif


@pytest.mark.slow
def test_change_job_end_to_end(tmp_path, rng):
    hw = 60
    start_year, end_year = 2017, 2024
    n_years = end_year - start_year + 1
    loss_region = (slice(10, 25), slice(10, 25))

    for k, year in enumerate(range(start_year, end_year + 1)):
        tile_dir = tmp_path / str(year) / "3" / "7"
        os.makedirs(tile_dir, exist_ok=True)

        tc = np.full((hw, hw), 80, np.uint8)
        if k >= 4:
            tc[loss_region] = 5  # loss from year index 4 on
        write_tree_cover_tif(str(tile_dir / "3X7Y_FINAL.tif"), tc,
                             (0, 0, 0.01, 0.01))

        # 5 NDMI acquisitions per year: tree-like NDMI except the loss
        # region after the event
        ndmi = rng.normal(3000, 150, (5, hw, hw))
        if k >= 4:
            ndmi[:, loss_region[0], loss_region[1]] = \
                rng.normal(-2000, 100, (5, 15, 15))
        save_array(str(tile_dir / "ard_ndmi.h5"),
                   ndmi.astype(np.int16))
        np.save(str(tile_dir / "ard_dates.npy"),
                np.sort(rng.choice(np.arange(10, 360), 5,
                                   replace=False)))

    gain, loss = run_change(str(tmp_path), 3, 7, start_year, end_year)
    assert gain.shape == (hw, hw)
    assert loss.shape == (hw, hw)
    # planted loss detected inside the region, little outside
    assert (loss[12:23, 12:23] > 0).mean() > 0.5
    outside = loss.copy()
    outside[8:27, 8:27] = 0
    assert (outside > 0).mean() < 0.05
    # outputs written
    out_dir = tmp_path / "change" / "3" / "7"
    assert (out_dir / "3X7Y_gain.tif").exists()
    assert (out_dir / "3X7Y_loss.tif").exists()


@pytest.mark.slow
def test_change_job_batch_matches_single(tmp_path, rng):
    """--tiles batch mode (one KDE dispatch for all tiles) must write
    the same rasters as per-tile runs."""
    from ttc.cli.change_job import run_change_batch

    hw = 48
    start_year, end_year = 2017, 2022
    coords = [(1, 1), (2, 5)]
    for x, y in coords:
        for k, year in enumerate(range(start_year, end_year + 1)):
            tile_dir = tmp_path / str(year) / str(x) / str(y)
            os.makedirs(tile_dir, exist_ok=True)
            tc = np.full((hw, hw), 75, np.uint8)
            if k >= 3 and x == 1:
                tc[5:20, 5:20] = 10
            write_tree_cover_tif(str(tile_dir / f"{x}X{y}Y_FINAL.tif"),
                                 tc, (0, 0, 0.01, 0.01))
            ndmi = rng.normal(2800, 140, (4, hw, hw))
            if k >= 3 and x == 1:
                ndmi[:, 5:20, 5:20] = rng.normal(-1800, 90, (4, 15, 15))
            save_array(str(tile_dir / "ard_ndmi.h5"),
                       ndmi.astype(np.int16))
            np.save(str(tile_dir / "ard_dates.npy"),
                    np.sort(rng.choice(np.arange(10, 360), 4,
                                       replace=False)))

    singles = [run_change(str(tmp_path), x, y, start_year, end_year,
                          out_dir=str(tmp_path / f"single_{x}_{y}"))
               for x, y in coords]
    batch = run_change_batch(str(tmp_path), coords, start_year,
                             end_year)
    assert len(batch) == 2
    for (gain_s, loss_s), (gain_b, loss_b) in zip(singles, batch):
        np.testing.assert_array_equal(gain_s, gain_b)
        np.testing.assert_array_equal(loss_s, loss_b)
    for x, y in coords:
        assert (tmp_path / "change" / str(x) / str(y)
                / f"{x}X{y}Y_change.tif").exists()
