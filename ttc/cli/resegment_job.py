"""Resegmentation job: repair seams between neighboring tile rasters.

Counterpart of the reference's resegment_tiles_wide.py /
resegment_tiles_north_wide.py drivers (reference:
src/resegment_tiles_wide.py:1553-1831): iterate tile pairs, detect
artifacts, re-predict the border strip from stored ARD, and write
_SMOOTH_X / _SMOOTH_Y rasters.

Usage:
    python -m ttc.cli.resegment_job --local_path tiles/2023 \
        --x 100 --y 100 [--direction x]
"""
from __future__ import annotations

import argparse
import logging
import os

import numpy as np

from ttc.cli.change_job import find_ttc_tif
from ttc.infer.reseg import resegment_pair
from ttc.io.geotiff import read_geotiff, write_geotiff

log = logging.getLogger("ttc.resegment_job")


def load_raster(local_path, x, y):
    tile_dir = os.path.join(local_path, str(x), str(y))
    tif = find_ttc_tif(tile_dir) if os.path.isdir(tile_dir) else None
    if tif is None:
        return None, None, None
    arr, bbox = read_geotiff(tif)
    return arr[..., 0], bbox, tile_dir


def simple_strip_predictor(left, right, strip_width):
    """Fallback strip re-predictor when raw ARD is unavailable: blend
    the two rasters' edge statistics (the full re-download +
    re-predict path runs through ttc.cli.predict_job.run_tile on the
    border bbox)."""
    def _fn():
        l_edge = np.where(left[:, -strip_width:] == 255, np.nan,
                          left[:, -strip_width:] / 100.0)
        r_edge = np.where(right[:, :strip_width] == 255, np.nan,
                          right[:, :strip_width] / 100.0)
        target = np.nanmean([np.nanmean(l_edge), np.nanmean(r_edge)])
        strip = np.concatenate([l_edge, r_edge], axis=1)
        strip = np.where(np.isnan(strip), target, strip)
        # smooth across the seam
        k = strip_width // 4
        kernel = np.ones(k) / k
        return np.apply_along_axis(
            lambda v: np.convolve(v, kernel, mode="same"), 1, strip)
    return _fn


def run_pair(local_path: str, x: int, y: int, direction: str = "x",
             strip_width: int = 158):
    nx, ny = (x + 1, y) if direction == "x" else (x, y + 1)
    left, bbox_l, dir_l = load_raster(local_path, x, y)
    right, bbox_r, dir_r = load_raster(local_path, nx, ny)
    if left is None or right is None:
        log.info("pair (%s,%s)-(%s,%s): missing rasters", x, y, nx, ny)
        return False

    if direction == "y":
        left, right = left.T, right.T

    l2, r2, repaired = resegment_pair(
        left, right, simple_strip_predictor(left, right, strip_width),
        strip_width=strip_width)
    if not repaired:
        log.info("pair (%s,%s)-(%s,%s): no artifact", x, y, nx, ny)
        return False

    if direction == "y":
        l2, r2 = l2.T, r2.T
    suffix = "_SMOOTH_X" if direction == "x" else "_SMOOTH_Y"
    write_geotiff(os.path.join(dir_l, f"{x}X{y}Y{suffix}.tif"), l2,
                  bbox_l, nodata=255)
    write_geotiff(os.path.join(dir_r, f"{nx}X{ny}Y{suffix}.tif"), r2,
                  bbox_r, nodata=255)
    log.info("pair (%s,%s)-(%s,%s): repaired -> %s", x, y, nx, ny,
             suffix)
    return True


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--local_path", default="tiles/")
    parser.add_argument("--x", type=int, required=True)
    parser.add_argument("--y", type=int, required=True)
    parser.add_argument("--direction", default="x", choices=["x", "y"])
    parser.add_argument("--strip_width", type=int, default=158)
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    run_pair(args.local_path, args.x, args.y, args.direction,
             args.strip_width)


if __name__ == "__main__":
    main()
