"""Change-detection job: multi-year gain/loss rasters per tile.

Counterpart of the reference's change_job.py (reference:
src/change_job.py:259-717): loads per-year tree-cover tifs
(_SMOOTH_XY > _SMOOTH_X > _SMOOTH_Y > _FINAL preference) and per-year
NDMI ARD stacks, runs KDE calibration + gain/loss detection, writes
loss/gain year rasters.

Usage:
    python -m ttc.cli.change_job --local_path tiles/ --x 100 --y 100 \
        --start_year 2017 --end_year 2024
"""
from __future__ import annotations

import argparse
import glob
import logging
import os

import numpy as np

from ttc.change.kde import make_all_kde
from ttc.change.pipeline import detect_change, validate_ard
from ttc.io.arrays import load_array
from ttc.io.geotiff import read_geotiff, write_geotiff

log = logging.getLogger("ttc.change_job")

SUFFIX_PREFERENCE = ("_SMOOTH_XY", "_SMOOTH_X", "_SMOOTH_Y", "_FINAL",
                     "_POST")


def find_ttc_tif(tile_dir: str):
    """Pick the best available raster by suffix preference
    (reference: resegment_tiles_wide.py:713-751)."""
    for suffix in SUFFIX_PREFERENCE:
        hits = glob.glob(os.path.join(tile_dir, f"*{suffix}.tif"))
        if hits:
            return hits[0]
    return None


def load_year_stack(local_path: str, x: int, y: int, start_year: int,
                    end_year: int):
    """(N_years, H, W) float tree-cover stack + (N_years, H, W) bool
    no-image masks; missing years are nan-filled then
    nearest-interpolated."""
    layers = []
    for year in range(start_year, end_year + 1):
        tile_dir = os.path.join(local_path, str(year), str(x), str(y))
        tif = find_ttc_tif(tile_dir) if os.path.isdir(tile_dir) else None
        if tif:
            arr, _ = read_geotiff(tif)
            layers.append(arr[..., 0].astype(np.float32))
        else:
            layers.append(None)
    shape = next((l.shape for l in layers if l is not None), None)
    if shape is None:
        raise FileNotFoundError("no tree cover rasters found")
    fs = np.stack([
        l if l is not None else np.full(shape, np.nan, np.float32)
        for l in layers])
    # per-year no-image masks: missing tif or 255-nodata pixels
    # (reference change_job.py:300-330 'nans')
    nans = np.isnan(fs) | (fs == 255)
    # forward/backward fill missing years
    for i in range(1, len(fs)):
        mask = np.isnan(fs[i])
        fs[i][mask] = fs[i - 1][mask]
    for i in range(len(fs) - 2, -1, -1):
        mask = np.isnan(fs[i])
        fs[i][mask] = fs[i + 1][mask]
    return fs, nans


def load_slope(local_path: str, x: int, y: int, start_year: int,
               end_year: int, shape):
    """Per-tile slope raster (degrees) persisted by predict_job with
    the change artifacts (reference zips dem into {year}/change/
    — io.py:153-201). Falls back to zeros when absent."""
    for year in range(end_year, start_year - 1, -1):
        p = os.path.join(local_path, str(year), str(x), str(y),
                         "dem.npy")
        if os.path.exists(p):
            dem = np.load(p).astype(np.float32)
            if dem.shape == tuple(shape):
                return dem
    log.warning("no persisted slope raster for %s/%s — slope strata "
                "degenerate to flat", x, y)
    return np.zeros(shape, np.float32)


def load_ndmi_stacks(local_path: str, x: int, y: int, start_year: int,
                     end_year: int):
    """Concatenate per-year ard_ndmi stacks + date offsets."""
    stacks = []
    dates = []
    n_per_year = []
    for k, year in enumerate(range(start_year, end_year + 1)):
        tile_dir = os.path.join(local_path, str(year), str(x), str(y))
        ndmi_path = os.path.join(tile_dir, "ard_ndmi.h5")
        dates_path = os.path.join(tile_dir, "ard_dates.npy")
        if os.path.exists(ndmi_path) and os.path.exists(dates_path):
            nd = load_array(ndmi_path)
            dd = np.load(dates_path) + k * 365
            stacks.append(nd)
            dates.append(dd)
            n_per_year.append(len(dd))
        else:
            n_per_year.append(0)
    if not stacks:
        raise FileNotFoundError("no NDMI ARD stacks found")
    return (np.concatenate(stacks, axis=0),
            np.concatenate(dates), n_per_year)


def _prepare_change_tile(local_path: str, x: int, y: int,
                         start_year: int, end_year: int) -> dict:
    """Everything before KDE calibration: load stacks, stable mask,
    threshold adjustments, 2017 outlier handling. Split out so fleets
    can batch several tiles' KDE stage in one device dispatch."""
    fs, nans = load_year_stack(local_path, x, y, start_year, end_year)
    ndmi_stack, dates, n_per_year = load_ndmi_stacks(
        local_path, x, y, start_year, end_year)

    # stable pixels: limited tree-cover variance across years
    valid = fs[0] != 255
    spread = np.nanmax(fs, axis=0) - np.nanmin(fs, axis=0)
    stable = (spread < 20) & valid
    if stable.sum() < 100:
        stable = valid

    # per-year loss-threshold adjustments from tile-mean TTC deltas
    # (reference change_job.py:451-471): a symmetric dip/rebound means
    # the baseline itself moved, so the loss threshold is offset
    adjustments = []
    for i in range(fs.shape[0]):
        adj = 0.0
        if i > 0:
            adj = float(np.mean(fs[i] - fs[i - 1]))
        if i < fs.shape[0] - 1:
            adj = (adj + float(np.mean(fs[i] - fs[i + 1]))) / 2
        adjustments.append(0.0 if i == 0 else adj)
    adjustments = np.asarray(adjustments)

    # 2017 L2A sensor-calibration outlier handling (reference :511-521)
    outliers = validate_ard(n_per_year, ndmi_stack)
    if outliers and len(n_per_year) > 2 and n_per_year[0] > 0:
        ims2018 = ndmi_stack[n_per_year[0]:n_per_year[0]
                             + n_per_year[1]]
        if len(ims2018):
            ndmi_stack[:n_per_year[0]] = np.median(ims2018, axis=0)[None]
        fs[0] = np.mean(fs[0:2], axis=0)
    return dict(fs=fs, nans=nans, ndmi=ndmi_stack, dates=dates,
                n_per_year=n_per_year, stable=stable,
                adjustments=adjustments)


def run_change(local_path: str, x: int, y: int, start_year: int,
               end_year: int, out_dir: str | None = None,
               prep: dict | None = None, kde: tuple | None = None):
    if prep is None:
        prep = _prepare_change_tile(local_path, x, y, start_year,
                                    end_year)
    fs, nans = prep["fs"], prep["nans"]
    ndmi_stack, dates = prep["ndmi"], prep["dates"]
    n_per_year, stable = prep["n_per_year"], prep["stable"]
    adjustments = prep["adjustments"]

    if kde is None:
        # device-resident default: the four ~110 MB boolean stacks
        # never cross the host link; candidates compute on device
        # (bit-identical to the host stage, tests/test_change_device)
        kde = make_all_kde(ndmi_stack, stable, readback=False)
    kde5, kde10, kde25, kde2, pct = kde
    if isinstance(kde5, np.ndarray):
        gain, loss = detect_change(kde5.astype(np.int16),
                                   kde10.astype(np.int16),
                                   kde25.astype(np.int16),
                                   kde2.astype(np.int16), dates, fs,
                                   adjustments)
    else:
        from ttc.change.device import candidates_device

        cands = candidates_device(kde5, kde10, kde25, kde2, dates,
                                  fs.shape[0])
        gain, loss = detect_change(None, None, None, None, dates, fs,
                                   adjustments, candidates=cands)
        pct = np.asarray(pct).astype(np.float32) / np.float32(100.0)

    # time-series gain filtering with slope-stratified counterfactuals
    # (reference change_job flow; change.py:661-1225)
    from ttc.change.counterfactuals import (
        calc_reference_change,
        calc_tree_change,
        filter_gain_px,
    )

    slope_deg = load_slope(local_path, x, y, start_year, end_year,
                           fs[0].shape)
    notree = np.min(fs, axis=0) < 30
    ma = pct
    cfs_flat = calc_reference_change(ma, 0, 10, notree, slope_deg)
    cfs_hill = calc_reference_change(ma, 10, 20, notree, slope_deg)
    cfs_steep = calc_reference_change(ma, 20, 90, notree, slope_deg)
    cfs_trees = calc_tree_change(ma, 90, ~notree, slope_deg)
    gainpx, labels, additional, _ = filter_gain_px(
        gain, loss, ma, fs, cfs_flat, cfs_hill, cfs_steep, cfs_trees,
        cfs_trees, notree, slope_deg, dates,
        [int(n) for n in n_per_year])
    accepted = np.isin(labels, gainpx) | (additional > 0)
    gain = (gain * accepted).astype(np.uint8)

    # combined change raster with unstable-loss / no-image suppression
    # (reference change_job.py:666-697)
    from ttc.change.pipeline import build_change_raster

    med = build_change_raster(fs, gain, loss, nans,
                              start_year=start_year)

    out_dir = out_dir or os.path.join(local_path, "change", str(x),
                                      str(y))
    os.makedirs(out_dir, exist_ok=True)
    bbox = (0.0, 0.0, gain.shape[1] / 36000.0, gain.shape[0] / 36000.0)
    write_geotiff(os.path.join(out_dir, f"{x}X{y}Y_gain.tif"), gain,
                  bbox, nodata=0)
    write_geotiff(os.path.join(out_dir, f"{x}X{y}Y_loss.tif"), loss,
                  bbox, nodata=0)
    write_geotiff(os.path.join(out_dir, f"{x}X{y}Y_change.tif"),
                  med.astype(np.uint8), bbox, nodata=255)
    return gain, loss


def run_change_batch(local_path: str, coords: list, start_year: int,
                     end_year: int, out_dir: str | None = None):
    """Process several tiles with the KDE calibration stage batched
    into ONE device dispatch (ttc.change.kde.make_all_kde_many) — the
    per-tile results are identical to run_change; only the dispatch
    and readback latency is amortized. Tiles that fail to load are
    skipped with a log line."""
    from ttc.change.kde import make_all_kde_many

    preps, ok_coords = [], []
    for x, y in coords:
        try:
            preps.append(_prepare_change_tile(local_path, x, y,
                                              start_year, end_year))
            ok_coords.append((x, y))
        except (FileNotFoundError, OSError) as exc:
            log.warning("skipping tile %s/%s: %s", x, y, exc)
    if not preps:
        return []
    kdes = make_all_kde_many([p["ndmi"] for p in preps],
                             [p["stable"] for p in preps],
                             readback=False)
    results = []
    for (x, y), prep, kde in zip(ok_coords, preps, kdes):
        results.append(run_change(local_path, x, y, start_year,
                                  end_year, out_dir, prep=prep,
                                  kde=kde))
    return results


def _parse_coords(spec: str):
    """"x1,y1;x2,y2" -> [(x1, y1), (x2, y2)]."""
    out = []
    for pair in spec.split(";"):
        xs, ys = pair.split(",")
        out.append((int(xs), int(ys)))
    return out


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--local_path", default="tiles/")
    parser.add_argument("--x", type=int)
    parser.add_argument("--y", type=int)
    parser.add_argument("--tiles", default=None,
                        help="batch mode: 'x1,y1;x2,y2;...' — KDE "
                        "calibration for all tiles in one device "
                        "dispatch")
    parser.add_argument("--start_year", type=int, default=2017)
    parser.add_argument("--end_year", type=int, default=2024)
    parser.add_argument("--out_dir", default=None)
    args = parser.parse_args(argv)
    from ttc.utils.logging import setup_logging
    setup_logging()
    from ttc.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    if args.tiles:
        run_change_batch(args.local_path, _parse_coords(args.tiles),
                         args.start_year, args.end_year, args.out_dir)
    else:
        if args.x is None or args.y is None:
            parser.error("--x/--y required (or use --tiles)")
        run_change(args.local_path, args.x, args.y, args.start_year,
                   args.end_year, args.out_dir)


if __name__ == "__main__":
    main()
