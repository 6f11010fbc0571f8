"""Spatial rank and smoothing filters as jittable ops.

median_filter replaces scipy.ndimage.median_filter (used on DEM and
prediction rasters in the reference) with a gather + sort over the window
footprint — O(k^2 log k^2) per pixel, fully vectorized on the VPU.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _window_stack(x, size: int, mode: str = "reflect"):
    """Stack the size*size shifted copies of x along a new leading axis.

    Border handling matches scipy.ndimage's default 'reflect' mode.
    """
    r = size // 2
    pad_cfg = [(0, 0)] * (x.ndim - 2) + [(r, r), (r, r)]
    if mode == "reflect":
        xp = jnp.pad(x, pad_cfg, mode="symmetric")
    elif mode == "nearest":
        xp = jnp.pad(x, pad_cfg, mode="edge")
    else:
        xp = jnp.pad(x, pad_cfg, mode="constant")
    h, w = x.shape[-2], x.shape[-1]
    views = []
    for dy in range(size):
        for dx in range(size):
            sl = tuple([slice(None)] * (x.ndim - 2)
                       + [slice(dy, dy + h), slice(dx, dx + w)])
            views.append(xp[sl])
    return jnp.stack(views, axis=0)


def median_filter(x, size: int = 5):
    """Square-window median over the last two axes (scipy 'reflect'
    border)."""
    from ttc.ops.sortnet import median_axis0

    stack = _window_stack(x, size, "reflect")
    return median_axis0(stack)


def mean_filter(x, size: int):
    stack = _window_stack(x, size, "reflect")
    return jnp.mean(stack, axis=0)


def percentile_filter(x, pct: float, size: int):
    from ttc.ops.sortnet import quantile_axis0

    stack = _window_stack(x, size, "reflect")
    return quantile_axis0(stack, pct)


def fspecial_gauss(size: int, sigma: float) -> np.ndarray:
    """MATLAB-style gaussian kernel in [0, 1]
    (reference: src/download_and_predict_job.py:1489-1501)."""
    coords = np.arange(-size // 2 + 1, size // 2 + 1)
    x, y = np.meshgrid(coords, coords, indexing="ij")
    return np.exp(-((x ** 2 + y ** 2) / (2.0 * sigma ** 2))).astype(
        np.float32)


def hist_match(source, template):
    """Histogram matching via empirical quantile mapping
    (reference: src/downloading/utils.py:529-570). Jittable: uses sorted
    arrays + searchsorted instead of np.unique."""
    shape = source.shape
    src = source.ravel()
    tmpl = jnp.sort(template.ravel())
    n_s = src.shape[0]
    n_t = tmpl.shape[0]
    # source quantile of each pixel = rank / n
    order = jnp.argsort(src)
    ranks = jnp.empty_like(order).at[order].set(jnp.arange(n_s))
    quantiles = (ranks + 1.0) / n_s
    # template value at that quantile
    t_q = (jnp.arange(n_t) + 1.0) / n_t
    matched = jnp.interp(quantiles, t_q, tmpl)
    return matched.reshape(shape)
