"""Batched overlapping-window extraction for subtile prediction.

The reference slices, pads, and predicts 36 windows serially on the host
(reference: src/download_and_predict_job.py:1345-1425). Here the tile is
reflect-padded once by the halo and all windows are gathered into one
(36, ...) batch with static offsets — a single device op feeding one
batched forward pass.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ttc.core.config import InferenceConfig
from ttc.core.windows import window_offsets


def pad_tile(arr, halo: int):
    """Reflect-pad the two spatial axes (H, W of (..., H, W, C))."""
    cfg = [(0, 0)] * (arr.ndim - 3) + [(halo, halo), (halo, halo), (0, 0)]
    return jnp.pad(arr, cfg, mode="reflect")


def extract_windows(arr, offsets: np.ndarray, win: int):
    """Gather (N, ..., win, win, C) windows from a padded
    (..., H+2h, W+2h, C) tile at static offsets (tile coordinates ==
    padded coordinates of the window's top-left corner)."""
    out = []
    for ox, oy in offsets:
        sl = tuple([slice(None)] * (arr.ndim - 3)
                   + [slice(int(ox), int(ox) + win),
                      slice(int(oy), int(oy) + win), slice(None)])
        out.append(arr[sl])
    return jnp.stack(out, axis=0)


def build_model_inputs(s2_quarters, s1_quarters, s2_median, s1_median,
                       dem_slope, cfg: InferenceConfig):
    """Assemble the (36, 5, in, in, 17) model batch.

    Band layout per step (reference: download_and_predict_job.py:1398-1407):
      [:10]  S2 bands, [10] DEM slope, [11:13] S1 VV/VH, [13:] indices.
    Steps 0-3 are the quarterly medians, step 4 the annual median.

    Inputs:
      s2_quarters: (4, H, W, 14) quarterly medians of smoothed S2+indices
      s1_quarters: (4, H, W, 2)
      s2_median:   (H, W, 14) annual medians
      s1_median:   (H, W, 2)
      dem_slope:   (H, W)
    """
    halo = cfg.halo
    offs = window_offsets(cfg.tile_px, cfg.out_size, cfg.n_rows)
    win = cfg.in_size

    steps = jnp.concatenate(
        [s2_quarters, s2_median[None]], axis=0)          # (5, H, W, 14)
    s1_steps = jnp.concatenate(
        [s1_quarters, s1_median[None]], axis=0)          # (5, H, W, 2)
    dem5 = jnp.broadcast_to(
        dem_slope[None, :, :, None], (5,) + dem_slope.shape + (1,))

    full = jnp.concatenate(
        [steps[..., :10], dem5, s1_steps, steps[..., 10:]], axis=-1)
    full = pad_tile(full, halo)                          # (5, H+14, W+14, 17)
    return extract_windows(full, offs, win), offs        # (36, 5, win, win, 17)


def normalize(batch, norm_min, norm_max):
    """Per-band clip + midrange scaling to [-1, 1]
    (reference: download_and_predict_job.py:316-325)."""
    mn = jnp.asarray(norm_min, batch.dtype)
    mx = jnp.asarray(norm_max, batch.dtype)
    clipped = jnp.clip(batch, mn, mx)
    midrange = (mx + mn) / 2.0
    rng = (mx - mn) / 2.0
    return (clipped - midrange) / rng
