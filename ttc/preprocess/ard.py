"""Analysis-ready-data assembly: raw tile -> smoothed model inputs.

Host-side orchestrator around jitted device stages, replicating
process_tile + smooth_large_tile
(reference: src/download_and_predict_job.py:641-995,1057-1096):

  raw uint16 stacks -> aligned float datacube -> cloud/shadow masking
  (with up-to-3 rounds of >90%-interpolated date removal) -> gap-fill ->
  24-step regrid -> Whittaker smooth -> 12 monthly steps + indices.

Date removal uses np.delete on the host between device stages (arrays
stream through the device anyway); the per-(T,H,W) jit cache makes
recompiles rare in production where tiles share geometry.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ttc.core.codecs import from_uint16, to_db
from ttc.io.acquisition import RawTile
from ttc.ops import indices as idx_ops
from ttc.ops.filters import median_filter
from ttc.ops.regrid import apply_regrid, regrid_weights
from ttc.ops.resize import resize_bilinear
from ttc.ops.temporal import (
    fill_extremes_with_median,
    id_missing_px,
)
from ttc.ops.whittaker import WhittakerSmoother
from ttc.ops.morphology import dilate
from ttc.preprocess.clouds import identify_clouds_shadows, snow_filter
from ttc.preprocess.gapfill import interp_weights, remove_cloud_and_shadows


@dataclasses.dataclass
class ProcessedTile:
    s2: np.ndarray           # (T, H, W, 10) float32 clipped [0,1]
    dates: np.ndarray        # (T,)
    interp: np.ndarray       # (T, H, W) interpolation weights
    s1: np.ndarray           # (12, H, W, 2) dB
    dem: np.ndarray          # (H, W) / 90
    cloudshad: np.ndarray    # (T, H, W)
    snow: np.ndarray         # (H, W) snow-free mask


@dataclasses.dataclass
class SmoothedTile:
    s2: np.ndarray           # (12, H, W, 14) smoothed bands + indices
    dates: np.ndarray
    interp: np.ndarray
    s1: np.ndarray
    dem: np.ndarray
    s2_median: np.ndarray    # (H, W, 14) raw medians (bands + indices)
    s1_median: np.ndarray    # (H, W, 2)
    clear_count: np.ndarray  # (H, W) count of clear acquisitions


def _adjust_shape(arr, width, height):
    """Center pad/crop the two spatial axes to (width, height)
    (reference: download_and_predict_job.py:260-310)."""
    arr = np.asarray(arr)
    lead = arr.ndim - 3 if arr.ndim >= 3 else 0
    if arr.ndim == 2:
        arr = arr[None, ..., None]
    elif arr.ndim == 3:
        arr = arr[..., None]

    for axis, target in ((1, width), (2, height)):
        cur = arr.shape[axis]
        if cur < target:
            lo = (target - cur) // 2
            hi = target - cur - lo
            cfg = [(0, 0)] * arr.ndim
            cfg[axis] = (lo, hi) if lo > 0 else (target - cur, 0)
            arr = np.pad(arr, cfg, mode="edge")
        elif cur > target:
            excess = cur - target
            lo = excess // 2
            hi = excess - lo
            sl = [slice(None)] * arr.ndim
            sl[axis] = slice(lo, cur - hi)
            arr = arr[tuple(sl)]
    return arr.squeeze()


def assemble_s2(s2_10: np.ndarray, s2_20: np.ndarray) -> np.ndarray:
    """Build the (T, H, W, 10) stack: native 10 m bands + bilinearly
    upsampled 20 m bands (SR refines bands 4:10 later)
    (reference: :735-783; odd-shape reconciliation handled by resize
    directly to the target grid)."""
    t = s2_10.shape[0]
    h, w = s2_10.shape[1], s2_10.shape[2]
    out = np.zeros((t, h, w, 10), np.float32)
    out[..., :4] = s2_10
    up = np.asarray(resize_bilinear(jnp.asarray(s2_20), (h, w)))
    out[..., 4:] = up
    return out


def process_tile(raw: RawTile, make_shadow: bool = True,
                 max_mask_rounds: int = 3) -> ProcessedTile:
    s2_10 = from_uint16(raw.s2_10) if raw.s2_10.dtype == np.uint16 \
        else np.float32(raw.s2_10)
    s2_20 = from_uint16(raw.s2_20) if raw.s2_20.dtype == np.uint16 \
        else np.float32(raw.s2_20)
    dates = np.asarray(raw.s2_dates)

    s1 = np.float32(raw.s1)
    if raw.s1.dtype == np.uint16:
        s1 = from_uint16(raw.s1)
        s1 = np.asarray(to_db(s1, 22))

    dem = np.asarray(median_filter(jnp.asarray(raw.dem, jnp.float32), 5))

    width = s2_20.shape[1] * 2
    height = s2_20.shape[2] * 2
    s1 = np.atleast_3d(_adjust_shape(s1, width, height))
    s2_10 = _adjust_shape(s2_10, width, height)
    dem = _adjust_shape(dem, width, height)
    if s2_10.ndim == 3:
        s2_10 = s2_10[None]

    sentinel2 = assemble_s2(s2_10, s2_20)

    # remove dates with >50% missing pixels (reference: :786-794)
    valid = np.ones(sentinel2.shape[0], bool)
    kill = np.asarray(id_missing_px(jnp.asarray(sentinel2),
                                    jnp.asarray(valid), thresh=2))
    if kill.any():
        sentinel2 = sentinel2[~kill]
        dates = dates[~kill]

    # snow screening (reference: :796-832; removal defunct unless >10)
    snow_mask = np.asarray(snow_filter(jnp.asarray(sentinel2))) > 0
    # persistent-snow map: 1 only where >=70% of dates are snowy and
    # not within 2 px of a snow-free area (reference :821-822)
    snow = 1.0 - np.asarray(dilate(
        jnp.asarray((np.mean(snow_mask, axis=0) < 0.7).astype(np.float32)),
        2))
    mean_snow = snow_mask.mean(axis=(1, 2))
    to_rm = np.argwhere(mean_snow > 0.25).flatten()
    if len(to_rm) > 10:
        keep = np.setdiff1d(np.arange(len(dates)), to_rm)
        sentinel2 = sentinel2[keep]
        dates = dates[keep]

    # fill residual 0/1 pixels with the temporal median (:835)
    sentinel2 = np.asarray(fill_extremes_with_median(
        jnp.asarray(sentinel2),
        jnp.ones(sentinel2.shape[0], bool)))

    if not make_shadow or sentinel2.shape[0] < 3:
        t, h, w = sentinel2.shape[:3]
        zeros = np.zeros((t, h, w), np.float32)
        return ProcessedTile(np.clip(sentinel2, 0, 1), dates, zeros, s1,
                             dem / 90.0, zeros, snow)

    # masking rounds: drop dates >90% interpolated, recompute (:849-919)
    cloudshad = fcps = interp = None
    for _ in range(max_mask_rounds + 1):
        cs, fc = identify_clouds_shadows(jnp.asarray(sentinel2),
                                         jnp.asarray(dem))
        interp = np.asarray(interp_weights(cs, 12.0, closing=15))
        cloudshad, fcps = np.asarray(cs), np.asarray(fc)
        to_rm = np.argwhere(
            np.mean(interp > 0, axis=(1, 2)) > 0.9).flatten()
        if len(to_rm) == 0 or len(to_rm) >= sentinel2.shape[0]:
            break
        sentinel2 = np.delete(sentinel2, to_rm, 0)
        dates = np.delete(dates, to_rm)

    # gap fill (:935-944)
    filled, interp, fully = remove_cloud_and_shadows(
        jnp.asarray(sentinel2), jnp.asarray(cloudshad),
        jnp.asarray(fcps))
    filled = np.asarray(filled)
    interp = np.asarray(interp)
    to_rm = np.argwhere(np.asarray(fully)).flatten()
    if len(to_rm) > 0 and len(to_rm) < filled.shape[0]:
        filled = np.delete(filled, to_rm, 0)
        dates = np.delete(dates, to_rm)
        interp = np.delete(interp, to_rm, 0)
        cs, _ = identify_clouds_shadows(jnp.asarray(filled),
                                        jnp.asarray(dem))
        cloudshad = np.asarray(cs)
        interp = np.asarray(interp_weights(cs, 12.0, closing=15))

    return ProcessedTile(np.clip(filled, 0, 1), dates, interp, s1,
                         dem / 90.0, cloudshad, snow)


def make_and_smooth_indices(s2: np.ndarray, dates: np.ndarray,
                            weights=None) -> np.ndarray:
    """Indices on the raw dates -> 24-step regrid -> Whittaker -> 12
    monthly (reference: :998-1028)."""
    if weights is None:
        weights, _ = regrid_weights(dates)
    raw_idx = np.asarray(idx_ops.all_indices(jnp.asarray(s2)))
    regridded = apply_regrid(jnp.asarray(raw_idx), weights)
    sm = WhittakerSmoother(lmbd=100.0, size=24, outsize=12)
    return np.asarray(sm.interpolate_array(regridded))


def smooth_tile(tile: ProcessedTile) -> SmoothedTile:
    """(T, H, W, 10) irregular -> (12, H, W, 14) monthly smoothed
    (reference smooth_large_tile :1057-1096), plus the raw medians and
    clear-count map consumed by the predictor."""
    s2, dates = tile.s2, tile.dates

    weights, _ = regrid_weights(dates)
    indices_monthly = make_and_smooth_indices(s2, dates, weights)

    regridded = apply_regrid(jnp.asarray(s2), weights)
    sm = WhittakerSmoother(lmbd=100.0, size=24, outsize=12)
    bands_monthly = np.asarray(sm.interpolate_array(regridded))

    out = np.concatenate([bands_monthly, indices_monthly], axis=-1)

    # raw medians for the model's 5th step
    # (reference process_subtiles :1152-1160)
    med_bands = np.median(s2, axis=0)
    med_idx = np.stack([
        np.median(np.asarray(idx_ops.evi(jnp.asarray(s2))), axis=0),
        np.median(np.asarray(idx_ops.bi(jnp.asarray(s2))), axis=0),
        np.median(np.asarray(idx_ops.msavi2(jnp.asarray(s2))), axis=0),
        np.median(np.asarray(idx_ops.grndvi(jnp.asarray(s2))), axis=0),
    ], axis=-1)
    s2_median = np.concatenate([med_bands, med_idx], axis=-1)
    s1_median = np.median(tile.s1, axis=0)
    clear_count = np.sum(tile.interp < 0.33, axis=0).astype(np.float32)

    return SmoothedTile(out.astype(np.float32), dates, tile.interp,
                        tile.s1, tile.dem, s2_median.astype(np.float32),
                        s1_median.astype(np.float32), clear_count)
