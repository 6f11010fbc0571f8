"""On-device Gaussian mosaic of overlapping window predictions.

Replicates load_mosaic_predictions
(reference: src/download_and_predict_job.py:1489-1641): Gaussian
fspecial(out_size, 36) blending weights, per-window agreement
reweighting (median/|delta| capped at 1.5x), weighted nansum, <=15 -> 0
thresholding, 255 nodata with 10-iteration dilation — all as dense
(N, H, W) tensor ops instead of a host loop over .npy files.

The window extents and Gaussian weight layers depend only on the static
geometry, so they are precomputed host-side as numpy literals — XLA
embeds them as constants instead of spending compile time folding 36
large scatter ops.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ttc.core.config import InferenceConfig
from ttc.core.windows import window_offsets
from ttc.ops.filters import fspecial_gauss
from ttc.ops.morphology import dilate

NODATA = 255.0


@functools.lru_cache(maxsize=8)
def _static_layers(tile_px: int, out_size: int, n_rows: int,
                   sigma: float):
    """Precomputed (N, H, W) extent masks and Gaussian weight layers."""
    offsets = window_offsets(tile_px, out_size, n_rows)
    n = len(offsets)
    extent = np.zeros((n, tile_px, tile_px), np.float32)
    gauss_l = np.zeros((n, tile_px, tile_px), np.float32)
    gauss = fspecial_gauss(out_size, sigma)
    for i, (ox, oy) in enumerate(offsets):
        extent[i, ox:ox + out_size, oy:oy + out_size] = 1.0
        gauss_l[i, ox:ox + out_size, oy:oy + out_size] = gauss
    return offsets, extent, gauss_l


def scatter_windows(preds, offsets, tile_px: int):
    """(N, S, S) window values -> (N, H, W) dense layers (zeros outside
    each window extent)."""
    n, s = preds.shape[0], preds.shape[1]
    dense = jnp.zeros((n, tile_px, tile_px), preds.dtype)
    for i, (ox, oy) in enumerate(offsets):
        dense = dense.at[i, int(ox):int(ox) + s,
                         int(oy):int(oy) + s].set(preds[i])
    return dense


def mosaic_predictions(preds, cfg: InferenceConfig | None = None,
                       agreement_reweight: bool = True):
    """Blend (N, S, S) float predictions in [0, 1] (or NODATA) into a
    (H, W) uint8 raster 0-100 with 255 nodata."""
    cfg = cfg or InferenceConfig()
    offsets, extent_np, gauss_np = _static_layers(
        cfg.tile_px, cfg.out_size, cfg.n_rows, cfg.gauss_sigma)
    extent = jnp.asarray(extent_np)
    g = jnp.asarray(gauss_np)

    # scale to 0-100, keep NODATA sentinel (reference :1576)
    scaled = jnp.where(preds >= NODATA, NODATA, preds * 100.0)
    p = scatter_windows(scaled, offsets, cfg.tile_px)

    # zero blending weight where the window is nodata (reference :1582)
    w = g * (p <= 100.0)

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


def mosaic_features(feat_windows, cfg: InferenceConfig | None = None):
    """Blend (N, S, S, D) per-window feature maps into a (H, W, D)
    int16 raster: Gaussian-weighted average without the agreement pass
    (the reference's depth>1 path, reference :1587-1592), vectorized
    over all D channels at once instead of 8 at a time."""
    cfg = cfg or InferenceConfig()
    offsets, extent_np, gauss_np = _static_layers(
        cfg.tile_px, cfg.out_size, cfg.n_rows, cfg.gauss_sigma)
    extent = jnp.asarray(extent_np)
    g = jnp.asarray(gauss_np)

    n, s, _, d = feat_windows.shape
    dense = jnp.zeros((n, cfg.tile_px, cfg.tile_px, d),
                      feat_windows.dtype)
    for i, (ox, oy) in enumerate(offsets):
        dense = dense.at[i, int(ox):int(ox) + s,
                         int(oy):int(oy) + s].set(feat_windows[i])

    w = g * extent
    wsum = jnp.maximum(jnp.sum(w, axis=0), 1e-8)
    blended = jnp.sum(dense * w[..., None], axis=0) / wsum[..., None]
    return jnp.clip(blended, -32.768, 32.767) * 1000.0


def extract_tile_features(params, windows, model, cfg=None):
    """Run the model with feature taps over a normalized (N, 5, in, in,
    17) window batch and mosaic the early (GRU steps, cropped to the
    output extent) + late (decoder) features into int16 rasters (the
    reference's --gen_feats path,
    reference: download_and_predict_job.py:1429-1448)."""
    cfg = cfg or InferenceConfig()
    preds, feats = model.apply(params, windows, return_features=True)
    early = feats["early"]          # (N, T, in, in, 64) GRU steps
    late = feats["late"]            # (N, out, out, 64)
    ctx = cfg.ctx // 2
    early = jnp.mean(early, axis=1)[:, ctx:-ctx, ctx:-ctx, :32]
    late = late[..., :32]
    return (mosaic_features(early, cfg).astype(jnp.int16),
            mosaic_features(late, cfg).astype(jnp.int16),
            preds)
