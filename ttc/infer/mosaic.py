"""On-device Gaussian mosaic of overlapping window predictions.

Replicates load_mosaic_predictions
(reference: src/download_and_predict_job.py:1489-1641): Gaussian
fspecial(out_size, 36) blending weights, per-window agreement
reweighting (median/|delta| capped at 1.5x), weighted nansum, <=15 -> 0
thresholding, 255 nodata with 10-iteration dilation — all as dense
(N, H, W) tensor ops instead of a host loop over .npy files.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ttc.core.config import InferenceConfig
from ttc.core.windows import window_offsets
from ttc.ops.filters import fspecial_gauss
from ttc.ops.morphology import dilate

NODATA = 255.0


def _dense_windows(preds, offsets, cfg: InferenceConfig):
    """Scatter (N, S, S) window predictions into (N, H, W) dense layers
    (zeros outside each window extent) plus the extent mask."""
    n = preds.shape[0]
    hw = cfg.tile_px
    s = cfg.out_size
    dense = jnp.zeros((n, hw, hw), preds.dtype)
    extent = jnp.zeros((n, hw, hw), preds.dtype)
    for i, (ox, oy) in enumerate(offsets):
        ox, oy = int(ox), int(oy)
        dense = dense.at[i, ox:ox + s, oy:oy + s].set(preds[i])
        extent = extent.at[i, ox:ox + s, oy:oy + s].set(1.0)
    return dense, extent


def mosaic_predictions(preds, cfg: InferenceConfig | None = None,
                       agreement_reweight: bool = True):
    """Blend (N, S, S) float predictions in [0, 1] (or NODATA) into a
    (H, W) uint8 raster 0-100 with 255 nodata."""
    cfg = cfg or InferenceConfig()
    offsets = window_offsets(cfg.tile_px, cfg.out_size, cfg.n_rows)
    gauss = jnp.asarray(fspecial_gauss(cfg.out_size, cfg.gauss_sigma))

    # scale to 0-100, keep NODATA sentinel (reference :1576)
    scaled = jnp.where(preds >= NODATA, NODATA, preds * 100.0)
    p, extent = _dense_windows(scaled, offsets, cfg)

    g, _ = _dense_windows(
        jnp.broadcast_to(gauss[None], preds.shape), offsets, cfg)
    # zero blending weight where the window is nodata (reference :1582)
    w = g * extent * (p <= 100.0)

    if agreement_reweight:
        # ratio_i = mean |mean_others - p_i| over window i's extent,
        # computed with nodata values *included* like the reference
        s_all = jnp.sum(p * extent, axis=0)
        c_all = jnp.sum(extent, axis=0)
        others_cnt = jnp.maximum(c_all[None] - extent, 0.0)
        others_mean = jnp.where(
            others_cnt > 0,
            (s_all[None] - p * extent) / jnp.maximum(others_cnt, 1.0), 0.0)
        px_ok = extent * (others_cnt > 0)
        diff = jnp.abs(others_mean - p) * px_ok
        ratios = jnp.sum(diff, axis=(1, 2)) \
            / jnp.maximum(jnp.sum(px_ok, axis=(1, 2)), 1.0)
        mult = jnp.median(ratios) / jnp.maximum(ratios, 1e-8)
        mult = jnp.minimum(mult, 1.5)
        w = w * mult[:, None, None]

    valid = extent * (p <= 100.0)
    wsum = jnp.sum(w * valid, axis=0)
    blended = jnp.sum(jnp.where(valid > 0, p, 0.0) * w, axis=0) \
        / jnp.maximum(wsum, 1e-8)
    any_valid = jnp.sum(valid, axis=0) > 0
    out = jnp.where(any_valid, blended, NODATA)

    out = jnp.where(out <= 0.15 * 100.0, 0.0, out)
    out = jnp.where(out > 100.0, NODATA, out)

    # dilate the nodata region 10 iterations with the full 3x3 structure
    # (reference :1636-1640)
    nodata = dilate((out == NODATA).astype(jnp.float32), iterations=10,
                    cross=False)
    out = jnp.where(nodata > 0, NODATA, out)
    return out.astype(jnp.uint8)
