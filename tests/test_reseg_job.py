"""End-to-end resegmentation job tests: planted seams on a 2x2 tile
grid are detected, repaired, suffix-accumulated to _SMOOTH_XY, and the
stored change-detection ARD is patched (reference:
src/resegment_tiles_wide.py:793-846, 1553-1831)."""
import os

import numpy as np
import pytest

from ttc.cli.resegment_job import (discover_tiles, pick_suffix,
                                   run_grid, run_pair)
from ttc.infer.reseg import (check_if_artifact, seam_diff,
                             update_ard_tiles)
from ttc.io.arrays import load_array, save_array
from ttc.io.geotiff import read_geotiff, write_geotiff

HW = 80
STRIP = 40  # production ratio: strip ~ half the tile (158 of 618)


def _write_tile(root, x, y, value, suffix="_FINAL", ndmi=None):
    tile_dir = os.path.join(root, str(x), str(y))
    os.makedirs(tile_dir, exist_ok=True)
    arr = np.full((HW, HW), value, np.uint8)
    write_geotiff(os.path.join(tile_dir, f"{x}X{y}Y{suffix}.tif"),
                  arr, (0.0, 0.0, 0.1, 0.1), nodata=255)
    if ndmi is not None:
        save_array(os.path.join(tile_dir, "ard_ndmi.h5"),
                   np.full((4, HW, HW), ndmi, np.int16))
    return tile_dir


@pytest.fixture
def seamed_grid(tmp_path):
    """2x2 grid with bright west column and dark east column: both
    x pairs and both y pairs of the east column differ."""
    root = str(tmp_path / "tiles")
    _write_tile(root, 0, 0, 70, ndmi=5000)
    _write_tile(root, 0, 1, 70, ndmi=5000)
    _write_tile(root, 1, 0, 20, ndmi=1000)
    _write_tile(root, 1, 1, 20, ndmi=1000)
    return root


def test_run_pair_writes_smooth_x_and_patches_ard(seamed_grid):
    assert run_pair(seamed_grid, 0, 0, "x", STRIP)
    left, _ = read_geotiff(
        os.path.join(seamed_grid, "0", "0", "0X0Y_SMOOTH_X.tif"))
    right, _ = read_geotiff(
        os.path.join(seamed_grid, "1", "0", "1X0Y_SMOOTH_X.tif"))
    left, right = left[..., 0], right[..., 0]
    assert not check_if_artifact(left, right)
    # the repair ramp halves the 50-point step's 8-px edge gradient
    assert seam_diff(left, right) < 25

    # NDMI stacks converge at the seam (was a 4000-step)
    nl = load_array(os.path.join(seamed_grid, "0", "0", "ard_ndmi.h5"))
    nr = load_array(os.path.join(seamed_grid, "1", "0", "ard_ndmi.h5"))
    step = abs(float(nl[:, :, -1].mean()) - float(nr[:, :, 0].mean()))
    assert step < 400  # was 4000
    # outer edges untouched
    assert nl[:, :, 0].mean() == 5000
    assert nr[:, :, -1].mean() == 1000


def test_grid_accumulates_smooth_xy(seamed_grid):
    # plant a y-direction seam too: make (1,1) a different level so
    # the y pass on the east column also repairs
    _write_tile(seamed_grid, 1, 1, 60, ndmi=4000)
    n = run_grid(seamed_grid, STRIP)
    assert n >= 2
    # (1,0): repaired by the x pass (vs (0,0)) and the y pass
    # (vs (1,1)) -> _SMOOTH_XY exists
    assert os.path.exists(os.path.join(
        seamed_grid, "1", "0", "1X0Y_SMOOTH_XY.tif"))
    # no remaining artifact on any adjacent pair, reading each tile's
    # best raster
    from ttc.cli.change_job import find_ttc_tif

    def best(x, y):
        arr, _ = read_geotiff(find_ttc_tif(
            os.path.join(seamed_grid, str(x), str(y))))
        return arr[..., 0]

    for (x, y), (nx, ny), d in [((0, 0), (1, 0), "x"),
                                ((0, 1), (1, 1), "x")]:
        l, r = best(x, y), best(nx, ny)
        assert not check_if_artifact(l, r), (x, y, d)


def test_pick_suffix_upgrade(tmp_path):
    tile_dir = str(tmp_path)
    assert pick_suffix(tile_dir, 3, 4, "x") == "_SMOOTH_X"
    assert pick_suffix(tile_dir, 3, 4, "y") == "_SMOOTH_Y"
    open(os.path.join(tile_dir, "3X4Y_SMOOTH_Y.tif"), "w").close()
    assert pick_suffix(tile_dir, 3, 4, "x") == "_SMOOTH_XY"
    assert pick_suffix(tile_dir, 3, 4, "y") == "_SMOOTH_Y"
    open(os.path.join(tile_dir, "3X4Y_SMOOTH_XY.tif"), "w").close()
    assert pick_suffix(tile_dir, 3, 4, "y") == "_SMOOTH_XY"


def test_update_ard_tiles_y_direction(tmp_path):
    top = str(tmp_path / "t")
    bot = str(tmp_path / "b")
    os.makedirs(top)
    os.makedirs(bot)
    save_array(os.path.join(top, "ard_ndmi.h5"),
               np.full((3, HW, HW), 2000, np.int16))
    save_array(os.path.join(bot, "ard_ndmi.h5"),
               np.full((5, HW, HW), -2000, np.int16))
    assert update_ard_tiles(top, bot, direction="y", width=STRIP)
    nt = load_array(os.path.join(top, "ard_ndmi.h5"))
    nb = load_array(os.path.join(bot, "ard_ndmi.h5"))
    # y direction: the seam is top's last ROWS vs bottom's first rows
    assert abs(float(nt[:, -1].mean()) - float(nb[:, 0].mean())) < 400
    assert nt[:, 0].mean() == 2000
    assert nb[:, -1].mean() == -2000
    # different T per tile preserved
    assert nt.shape[0] == 3 and nb.shape[0] == 5


def test_rejected_when_no_artifact(seamed_grid):
    # equal tiles -> no artifact -> nothing written
    _write_tile(seamed_grid, 0, 0, 50, ndmi=3000)
    _write_tile(seamed_grid, 1, 0, 50, ndmi=3000)
    assert not run_pair(seamed_grid, 0, 0, "x", STRIP)
    assert not os.path.exists(os.path.join(
        seamed_grid, "0", "0", "0X0Y_SMOOTH_X.tif"))


def test_discover_tiles(seamed_grid):
    assert sorted(discover_tiles(seamed_grid)) == [
        (0, 0), (0, 1), (1, 0), (1, 1)]
