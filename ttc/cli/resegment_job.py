"""Resegmentation job: repair seams between neighboring tile rasters.

Counterpart of the reference's resegment_tiles_wide.py /
resegment_tiles_north_wide.py drivers (reference:
src/resegment_tiles_wide.py:1553-1831, resegment_tiles_north_wide.py
:1700-1830): iterate tile pairs, detect artifacts, re-predict the
border strip from stored ARD (no re-download — our design persists
the smoothed border bundles at predict time), gate the repair on the
post-repair seam step, write _SMOOTH_X / _SMOOTH_Y rasters — upgraded
to _SMOOTH_XY when the other pass already touched the tile (reference
:1799-1816) — and patch the stored change-detection ARD so both
rasters and NDMI stacks agree across the seam (reference
update_ard_tiles :793-846).

Usage:
    # one pair
    python -m ttc.cli.resegment_job --local_path tiles/2023 \
        --x 100 --y 100 [--direction x]
    # full grid, x pass then y pass
    python -m ttc.cli.resegment_job --local_path tiles/2023 --grid
"""
from __future__ import annotations

import argparse
import logging
import os

import numpy as np

from ttc.cli.change_job import find_ttc_tif
from ttc.infer.reseg import (ard_strip_predictor,
                             regenerate_strip_features, resegment_pair,
                             seam_diff, update_ard_tiles,
                             update_border_strips)
from ttc.io.geotiff import read_geotiff, write_geotiff
from ttc.io.store import TileStore

log = logging.getLogger("ttc.resegment_job")


def load_raster(local_path, x, y):
    tile_dir = os.path.join(local_path, str(x), str(y))
    tif = find_ttc_tif(tile_dir) if os.path.isdir(tile_dir) else None
    if tif is None:
        return None, None, None
    arr, bbox = read_geotiff(tif)
    return arr[..., 0], bbox, tile_dir


def pick_suffix(tile_dir: str, x: int, y: int, direction: str) -> str:
    """Output suffix accumulation: a tile already smoothed by the
    other pass (or both) is written as _SMOOTH_XY (reference:
    resegment_tiles_wide.py:1799-1816 for the x pass,
    resegment_tiles_north_wide.py:1794-1815 for the y pass)."""
    other = ("_SMOOTH_Y", "_SMOOTH_XY") if direction == "x" \
        else ("_SMOOTH_X", "_SMOOTH_XY")
    for sfx in other:
        if os.path.exists(os.path.join(tile_dir,
                                       f"{x}X{y}Y{sfx}.tif")):
            return "_SMOOTH_XY"
    return "_SMOOTH_X" if direction == "x" else "_SMOOTH_Y"


def simple_strip_predictor(left, right, strip_width):
    """Fallback strip re-predictor when stored border ARD is
    unavailable: blend the two rasters' edge statistics (the full
    path re-predicts the strip from stored ARD via
    ttc.infer.reseg.ard_strip_predictor)."""
    def _fn():
        l_edge = np.where(left[:, -strip_width:] == 255, np.nan,
                          left[:, -strip_width:] / 100.0)
        r_edge = np.where(right[:, :strip_width] == 255, np.nan,
                          right[:, :strip_width] / 100.0)
        l_mean = np.nanmean(l_edge, axis=1)
        r_mean = np.nanmean(r_edge, axis=1)
        fill = np.nanmean([np.nanmean(l_mean), np.nanmean(r_mean)])
        l_mean = np.where(np.isnan(l_mean), fill, l_mean)
        r_mean = np.where(np.isnan(r_mean), fill, r_mean)
        # per-row linear ramp between the two tiles' edge levels:
        # continuous across the seam by construction
        t = (np.arange(2 * strip_width) + 0.5) / (2 * strip_width)
        return l_mean[:, None] * (1 - t) + r_mean[:, None] * t
    return _fn


def run_pair(local_path: str, x: int, y: int, direction: str = "x",
             strip_width: int = 158, params=None, model=None):
    """Repair one adjacent pair. With `params`, the border strip is
    re-predicted from the tiles' stored ARD borders; otherwise falls
    back to raster-space blending. Returns True when a repair was
    accepted and written."""
    nx, ny = (x + 1, y) if direction == "x" else (x, y + 1)
    left, bbox_l, dir_l = load_raster(local_path, x, y)
    right, bbox_r, dir_r = load_raster(local_path, nx, ny)
    if left is None or right is None:
        log.info("pair (%s,%s)-(%s,%s): missing rasters", x, y, nx, ny)
        return False

    if direction == "y":
        left, right = left.T, right.T

    store = TileStore(local_path)
    predict_fn = None
    if params is not None:
        predict_fn = ard_strip_predictor(
            store, (x, y), (nx, ny), params, model=model,
            direction=direction, strip_width=strip_width)
        if predict_fn is None:
            log.info("pair (%s,%s)-(%s,%s): no stored border ARD, "
                     "falling back to raster blend", x, y, nx, ny)
        else:
            # stored borders may be narrower than the requested strip
            strip_width = predict_fn.strip_width
    if predict_fn is None:
        predict_fn = simple_strip_predictor(left, right, strip_width)

    diff_before = seam_diff(left, right)
    l2, r2, repaired = resegment_pair(left, right, predict_fn,
                                      strip_width=strip_width)
    if not repaired:
        log.info("pair (%s,%s)-(%s,%s): no artifact", x, y, nx, ny)
        return False

    # accept only when the repair did not make the seam worse
    # (reference: resegment_tiles_wide.py:1763-1799 — smooth_diff
    # must beat diff + 20; a NaN pre-repair diff maps to 100 so an
    # all-nodata seam still accepts repairs with diff_after < 120)
    if np.isnan(diff_before):
        diff_before = 100.0
    diff_after = seam_diff(l2, r2)
    if not (np.isnan(diff_after) or diff_after < diff_before + 20):
        log.info("pair (%s,%s)-(%s,%s): repair rejected "
                 "(seam %0.1f -> %0.1f)", x, y, nx, ny, diff_before,
                 diff_after)
        return False

    if direction == "y":
        l2, r2 = l2.T, r2.T
    sfx_l = pick_suffix(dir_l, x, y, direction)
    sfx_r = pick_suffix(dir_r, nx, ny, direction)
    write_geotiff(os.path.join(dir_l, f"{x}X{y}Y{sfx_l}.tif"), l2,
                  bbox_l, nodata=255)
    write_geotiff(os.path.join(dir_r, f"{nx}X{ny}Y{sfx_r}.tif"), r2,
                  bbox_r, nodata=255)

    # keep the stored ARD seam-consistent with the repaired rasters
    # (reference update_ard_tiles :793-846)
    patched = update_ard_tiles(dir_l, dir_r, direction=direction,
                               width=strip_width)
    aligned = getattr(predict_fn, "aligned_s2", None)
    if aligned is not None:
        update_border_strips(store, (x, y), (nx, ny), aligned,
                             direction=direction)
    # *_feat variants: regenerate the stored feature rasters for the
    # repaired strip (reference resegment_tiles_wide_feat.py:530-545)
    if regenerate_strip_features(predict_fn, store, (x, y), (nx, ny),
                                 direction=direction):
        log.info("pair (%s,%s)-(%s,%s): stored feature rasters "
                 "patched seam-side", x, y, nx, ny)
    log.info("pair (%s,%s)-(%s,%s): repaired -> %s/%s "
             "(seam %0.1f -> %0.1f, ard %s)", x, y, nx, ny, sfx_l,
             sfx_r, diff_before, diff_after,
             "patched" if patched else "absent")
    return True


def discover_tiles(local_path: str):
    """All (x, y) tile dirs under local_path."""
    tiles = []
    for xd in os.listdir(local_path):
        xp = os.path.join(local_path, xd)
        if not (os.path.isdir(xp) and xd.lstrip("-").isdigit()):
            continue
        for yd in os.listdir(xp):
            if os.path.isdir(os.path.join(xp, yd)) \
                    and yd.lstrip("-").isdigit():
                tiles.append((int(xd), int(yd)))
    return tiles


def run_grid(local_path: str, strip_width: int = 158, params=None,
             model=None, directions=("x", "y")):
    """Full-grid repair: the x pass over all east-west pairs, then the
    y pass over all north-south pairs, ordered (Y desc, X asc) like
    the reference drivers (reference: resegment_tiles_wide.py
    :1704-1711). A tile repaired by both passes ends with a
    _SMOOTH_XY raster."""
    tiles = set(discover_tiles(local_path))
    n_repaired = 0
    for direction in directions:
        step = (1, 0) if direction == "x" else (0, 1)
        pairs = [t for t in tiles
                 if (t[0] + step[0], t[1] + step[1]) in tiles]
        pairs.sort(key=lambda t: (-t[1], t[0]))
        for x, y in pairs:
            try:
                n_repaired += bool(run_pair(
                    local_path, x, y, direction, strip_width,
                    params=params, model=model))
            except Exception:
                log.exception("pair (%s,%s) dir=%s failed", x, y,
                              direction)
    log.info("grid pass complete: %d repairs", n_repaired)
    return n_repaired


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--local_path", default="tiles/")
    parser.add_argument("--x", type=int, default=None)
    parser.add_argument("--y", type=int, default=None)
    parser.add_argument("--grid", action="store_true",
                        help="repair every adjacent pair (x pass then "
                             "y pass)")
    parser.add_argument("--direction", default="x", choices=["x", "y"])
    parser.add_argument("--strip_width", type=int, default=158)
    parser.add_argument("--model_path", default=None,
                        help="trained weights for ARD strip "
                             "re-prediction (defaults to the bundled "
                             "release weights)")
    parser.add_argument("--no_repredict", action="store_true",
                        help="skip ARD re-prediction, blend rasters "
                             "only")
    args = parser.parse_args(argv)
    from ttc.utils.logging import setup_logging
    setup_logging()
    from ttc.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    params = model = None
    if not args.no_repredict:
        from ttc.cli.predict_job import build_model_params

        try:
            model, params = build_model_params(args.model_path)
        except FileNotFoundError:
            log.warning("no trained weights — raster-blend repair only")

    if args.grid:
        run_grid(args.local_path, args.strip_width, params=params,
                 model=model)
    elif args.x is not None and args.y is not None:
        run_pair(args.local_path, args.x, args.y, args.direction,
                 args.strip_width, params=params, model=model)
    else:
        parser.error("provide --x/--y or --grid")


if __name__ == "__main__":
    main()
