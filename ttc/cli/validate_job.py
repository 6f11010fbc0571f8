"""Validation job: score tree-cover rasters against photo-interpreted
plots.

The reference keeps its accuracy assessment in notebooks
(reference: notebooks/analysis/test_data_longform.ipynb — producer's /
user's accuracy per tree-cover class; README.md:15 — Collect Earth
Online photo-interpreted plots) and ships one published plot-level
pair, references/paper_references/tanzania_{groundtruth,predictions}
.npy. This CLI turns that workflow into a reproducible command:

Modes
-----
1. plot arrays:  --groundtruth a.npy --prediction b.npy
   Matching arrays of per-plot tree cover in [0, 1] (negative =
   absent/no-tree, the published pair's coding).
2. raster vs plot CSV:  --raster tile_FINAL.tif --plots plots.csv
   CSV columns lon,lat,cover (cover in [0, 1] or percent); plots are
   sampled from the georeferenced raster and scored the same way.

Metrics (printed as one JSON line)
----------------------------------
- binary precision / recall / F1 / overall agreement at --threshold
  (default: any cover) — the paper's plot-agreement statistic
- plot-level mean absolute tree-cover error (plots with fractional
  cover only)
- producer's / user's accuracy per cover class (0-10 / 10-40 / >40 %,
  the notebook's strata)

Usage:
    python -m ttc.cli.validate_job \
        --groundtruth tanzania_groundtruth.npy \
        --prediction tanzania_predictions.npy
"""
from __future__ import annotations

import argparse
import json

import numpy as np

CLASS_EDGES = (0.10, 0.40)   # notebook strata: 0-10%, 10-40%, >40%


def binary_scores(gt: np.ndarray, pred: np.ndarray,
                  threshold: float = 0.0) -> dict:
    """Presence/absence agreement at `threshold` cover."""
    g = gt > threshold
    p = pred > threshold
    tp = int(np.sum(g & p))
    fp = int(np.sum(~g & p))
    fn = int(np.sum(g & ~p))
    tn = int(np.sum(~g & ~p))
    prec = tp / max(tp + fp, 1)
    rec = tp / max(tp + fn, 1)
    f1 = 2 * prec * rec / max(prec + rec, 1e-9)
    return {
        "n_plots": int(gt.size),
        "precision": round(prec, 4),
        "recall": round(rec, 4),
        "f1": round(f1, 4),
        "agreement": round((tp + tn) / max(gt.size, 1), 4),
        "tp": tp, "fp": fp, "fn": fn, "tn": tn,
    }


def cover_error(gt: np.ndarray, pred: np.ndarray) -> dict:
    """Plot-level tree-cover error over plots where both report a
    fractional cover (>= 0)."""
    m = (gt >= 0) & (pred >= 0)
    if not m.any():
        return {"n_cover_plots": 0}
    d = pred[m] - gt[m]
    return {
        "n_cover_plots": int(m.sum()),
        "mean_abs_error": round(float(np.abs(d).mean()), 4),
        "bias": round(float(d.mean()), 4),
        "rmse": round(float(np.sqrt((d ** 2).mean())), 4),
    }


def class_of(cover: np.ndarray) -> np.ndarray:
    """Cover class index per plot: 0 = 0-10%, 1 = 10-40%, 2 = >40%
    (absent/no-tree plots -> class 0)."""
    c = np.zeros(cover.shape, np.int32)
    c[cover > CLASS_EDGES[0]] = 1
    c[cover > CLASS_EDGES[1]] = 2
    return c


def class_accuracies(gt: np.ndarray, pred: np.ndarray) -> dict:
    """Producer's (recall of reference class) and user's (precision of
    mapped class) accuracy per cover class
    (reference notebook: test_data_longform.ipynb)."""
    gc = class_of(np.maximum(gt, 0.0))
    pc = class_of(np.maximum(pred, 0.0))
    out = {}
    names = ("0-10", "10-40", "40-100")
    for k, name in enumerate(names):
        ref = gc == k
        mapped = pc == k
        agree = int(np.sum(ref & mapped))
        out[name] = {
            "producers": round(agree / max(int(ref.sum()), 1), 4),
            "users": round(agree / max(int(mapped.sum()), 1), 4),
            "n_reference": int(ref.sum()),
        }
    return out


def sample_raster_at_plots(raster: np.ndarray, bbox, lons, lats):
    """Nearest-pixel sample of a georeferenced (H, W) raster at plot
    lon/lats; bbox = (min_lon, min_lat, max_lon, max_lat). Returns
    cover fractions with NaN outside the raster / at nodata."""
    h, w = raster.shape[:2]
    min_lon, min_lat, max_lon, max_lat = bbox
    col = (np.asarray(lons) - min_lon) / max(max_lon - min_lon, 1e-12) \
        * w
    row = (max_lat - np.asarray(lats)) / max(max_lat - min_lat, 1e-12) \
        * h
    col = np.floor(col).astype(int)
    row = np.floor(row).astype(int)
    ok = (col >= 0) & (col < w) & (row >= 0) & (row < h)
    vals = np.full(len(lons), np.nan)
    r = raster[..., 0] if raster.ndim == 3 else raster
    v = r[row[ok], col[ok]].astype(np.float64)
    v[v == 255] = np.nan                      # nodata
    vals[ok] = v / 100.0
    return vals


def validate_arrays(gt: np.ndarray, pred: np.ndarray,
                    threshold: float = 0.0) -> dict:
    gt = np.asarray(gt, np.float64)
    pred = np.asarray(pred, np.float64)
    report = {"binary": binary_scores(gt, pred, threshold)}
    report["cover"] = cover_error(gt, pred)
    report["classes"] = class_accuracies(gt, pred)
    return report


def validate_raster(raster, bbox, plots_csv: str,
                    threshold: float = 0.0) -> dict:
    rows = np.genfromtxt(plots_csv, delimiter=",", names=True)
    lons = np.atleast_1d(rows["lon"])
    lats = np.atleast_1d(rows["lat"])
    cover = np.atleast_1d(rows["cover"]).astype(np.float64)
    if cover.max() > 1.5:                      # percent -> fraction
        cover = cover / 100.0
    pred = sample_raster_at_plots(raster, bbox, lons, lats)
    m = np.isfinite(pred)
    return validate_arrays(cover[m], pred[m], threshold)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--groundtruth", default=None,
                        help=".npy per-plot reference cover")
    parser.add_argument("--prediction", default=None,
                        help=".npy per-plot predicted cover")
    parser.add_argument("--raster", default=None,
                        help="georeferenced tree-cover GeoTIFF")
    parser.add_argument("--plots", default=None,
                        help="CSV with lon,lat,cover columns")
    parser.add_argument("--threshold", type=float, default=0.0)
    args = parser.parse_args(argv)

    if args.raster:
        from ttc.io.geotiff import read_geotiff

        raster, bbox = read_geotiff(args.raster)
        report = validate_raster(raster, bbox, args.plots,
                                 args.threshold)
    else:
        gt = np.load(args.groundtruth)
        pred = np.load(args.prediction)
        report = validate_arrays(gt, pred, args.threshold)
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
