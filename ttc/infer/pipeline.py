"""End-to-end tile prediction: smoothed datacube -> tree-cover raster.

One jitted device program replaces the reference's serial host loop
(reference: src/download_and_predict_job.py:1125-1483,1515-1641):

  1. 12 monthly steps -> 4 quarterly medians (S2+indices and S1)
  2. assemble + reflect-pad + gather all 36 overlapping windows
  3. normalize and run the ConvGRU U-Net on the whole window batch
  4. per-window post-processing: bright-surface attenuation, clear-image
     no-data masking
  5. Gaussian + agreement-weighted mosaic to a uint8 raster

The predictor is shape-static, so it compiles once per tile geometry and
streams tiles at full MXU utilization.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ttc.core.bands import NORM_MAX, NORM_MIN
from ttc.core.config import InferenceConfig
from ttc.core.windows import window_offsets
from ttc.infer.mosaic import NODATA, mosaic_predictions
from ttc.infer.windows import extract_windows, normalize, pad_tile
from ttc.models.unet import TreeCoverNet
from ttc.ops.morphology import dilate, erode
from ttc.preprocess.masks import bright_surface_map


def quarterly_medians(monthly):
    """(12, H, W, C) -> (4, H, W, C) median of each 3-month group
    (reference: download_and_predict_job.py:1274-1283)."""
    from ttc.ops.sortnet import median_axis0

    t, h, w, c = monthly.shape
    assert t == 12
    return median_axis0(
        jnp.moveaxis(monthly.reshape(4, 3, h, w, c), 1, 0))


def clear_count_mask(clear_window, out_size: int):
    """Per-window no-data mask from clear-image counts.

    clear_window: (in, in) count of clear acquisitions per pixel for one
    window (including halo). Returns (out_size, out_size) bool: True
    where predictions must become nodata
    (reference: download_and_predict_job.py:1450-1464).
    """
    inner = clear_window[6:-6, 6:-6]
    no_img = (inner < 1).astype(jnp.float32)
    no_img = dilate(erode(no_img, 6, cross=False), 6, cross=False)

    n = inner.shape[0]
    block = n // 4
    blocks = no_img.reshape(4, block, 4, block).sum(axis=(1, 3))
    flag = blocks > (block * block) * 0.25
    up = jnp.repeat(jnp.repeat(flag, block, axis=0), block, axis=1)
    return up[1:-1, 1:-1]


@functools.lru_cache(maxsize=64)
def _compiled_tile_fn(model, cfg: InferenceConfig, batched: bool):
    """One jitted tile program per (model, geometry): flax modules and
    InferenceConfig are frozen/hashable, so every TilePredictor with
    the same architecture + geometry shares ONE XLA program instead of
    re-tracing per instance (a resegmentation grid pass constructs a
    predictor per pair — without this cache each pair paid a fresh
    ~60 s compile)."""
    fn = predict_tile_batch if batched else predict_tile
    return jax.jit(functools.partial(fn, model=model, cfg=cfg))


class TilePredictor:
    """Compiled tile-inference program.

    Usage:
        predictor = TilePredictor(params)
        raster = predictor(s2_monthly, s1_monthly, slope,
                           s2_median, s1_median, clear_count)

    `tile_batch` > 1 compiles a multi-tile program that runs the model
    over all tiles' windows as ONE batch — on v5e a 72-window forward
    costs only ~16% more than 36, so pairing tiles nearly doubles
    throughput. Call the predictor with batched (leading tile axis)
    inputs in that case.
    """

    def __init__(self, params, cfg: InferenceConfig | None = None,
                 model: TreeCoverNet | None = None,
                 tile_batch: int = 1):
        self.cfg = cfg or InferenceConfig()
        self.model = model or TreeCoverNet()
        self.params = params
        self.tile_batch = tile_batch
        self._fn = _compiled_tile_fn(self.model, self.cfg,
                                     tile_batch > 1)

    def __call__(self, s2_monthly, s1_monthly, slope, s2_median,
                 s1_median, clear_count):
        return self._fn(self.params, s2_monthly, s1_monthly, slope,
                        s2_median, s1_median, clear_count)


def _prepare_windows(s2_monthly, s1_monthly, slope, s2_median,
                     s1_median, clear_count, cfg: InferenceConfig,
                     norm_dtype=None):
    """Normalized window batch + per-window aux tensors for one tile.

    Memory-lean formulation: normalization is pixelwise (it commutes
    exactly with window extraction) and the bright-surface weight has
    influence radius 6 < halo 7 (bit-identical computed tile-level),
    so the tile is normalized/weighted ONCE and only the normalized
    windows are materialized — in the model's compute dtype. The raw
    f32 window batch of the naive layout (5.8 GB at tile_batch 4,
    production geometry) never exists.
    """
    halo = cfg.halo
    offs = window_offsets(cfg.tile_px, cfg.out_size, cfg.n_rows)
    s2_q = quarterly_medians(s2_monthly)
    s1_q = quarterly_medians(s1_monthly)

    steps = jnp.concatenate(
        [s2_q, s2_median[None]], axis=0)                 # (5, H, W, 14)
    s1_steps = jnp.concatenate(
        [s1_q, s1_median[None]], axis=0)
    dem5 = jnp.broadcast_to(
        slope[None, :, :, None], (5,) + slope.shape + (1,))
    full = jnp.concatenate(
        [steps[..., :10], dem5, s1_steps, steps[..., 10:]], axis=-1)
    full_p = pad_tile(full, halo)                  # (5, H+14, W+14, 17)

    bright_full = bright_surface_map(full_p)       # (H+14, W+14)
    bright = extract_windows(bright_full[..., None], offs + halo,
                             cfg.out_size)[..., 0]

    norm_p = normalize(full_p, NORM_MIN, NORM_MAX)
    if norm_dtype is not None:
        norm_p = norm_p.astype(norm_dtype)
    norm = extract_windows(norm_p, offs, cfg.in_size)

    clear_pad = pad_tile(clear_count[..., None], halo)[..., 0]
    clear_wins = extract_windows(clear_pad[..., None], offs,
                                 cfg.in_size)[..., 0]
    return norm, bright, clear_wins


def _postprocess(preds, bright, clear_wins, cfg: InferenceConfig):
    """Bright-surface attenuation, clear-count nodata, mosaic."""
    preds = preds.astype(jnp.float32) * bright

    nodata_mask = jax.vmap(
        lambda cw: clear_count_mask(cw, cfg.out_size))(clear_wins)
    window_dead = jnp.median(
        clear_wins.reshape(clear_wins.shape[0], -1), axis=1) < 1
    preds = jnp.where(window_dead[:, None, None], NODATA, preds)
    preds = jnp.where(nodata_mask, NODATA, preds)
    return mosaic_predictions(preds, cfg)


def predict_tile(params, s2_monthly, s1_monthly, slope, s2_median,
                 s1_median, clear_count, *, model: TreeCoverNet,
                 cfg: InferenceConfig):
    """The jitted single-tile program. Arguments:

    s2_monthly: (12, H, W, 14) smoothed S2 bands + indices
    s1_monthly: (12, H, W, 2) S1 dB
    slope:      (H, W) DEM slope / 90
    s2_median:  (H, W, 14) annual medians of the raw (pre-smoothing) cube
    s1_median:  (H, W, 2)
    clear_count:(H, W) number of clear acquisitions per pixel
    """
    norm, bright, clear_wins = _prepare_windows(
        s2_monthly, s1_monthly, slope, s2_median, s1_median,
        clear_count, cfg, norm_dtype=model.dtype)
    preds = model.apply(params, norm)                    # (36, out, out)
    return _postprocess(preds, bright, clear_wins, cfg)


def predict_tile_batch(params, s2_monthly, s1_monthly, slope,
                       s2_median, s1_median, clear_count, *,
                       model: TreeCoverNet, cfg: InferenceConfig):
    """Multi-tile program: inputs have a leading tile axis; all tiles'
    windows run through the model as one (T*36, ...) batch."""
    norm, bright, clear_wins = jax.vmap(
        lambda a, b, c, d, e, f: _prepare_windows(
            a, b, c, d, e, f, cfg, norm_dtype=model.dtype))(
        s2_monthly, s1_monthly, slope, s2_median, s1_median,
        clear_count)
    t, n = norm.shape[0], norm.shape[1]
    flat = norm.reshape((t * n,) + norm.shape[2:])
    preds = model.apply(params, flat)
    preds = preds.reshape((t, n) + preds.shape[1:])
    return jax.vmap(lambda p, b, c: _postprocess(p, b, c, cfg))(
        preds, bright, clear_wins)


def predict_windows(params, batch, model: TreeCoverNet):
    """Plain batched forward on pre-normalized windows (benchmark /
    feature-extraction entry)."""
    return model.apply(params, batch)
