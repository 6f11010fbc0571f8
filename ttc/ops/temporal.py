"""Mask-aware temporal gap ops: missing-pixel detection and median fill.

Fixed-shape equivalents of the reference's interpolation module
(reference: src/preprocessing/interpolation.py:5-56 and
src/download_and_predict_job.py:1031-1054). Instead of np.delete on bad
dates we return kill masks for `DateStack.drop`.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ttc.core.datacube import masked_median


@partial(jax.jit, static_argnames=("thresh",))
def id_missing_px(s2, valid, thresh: int = 11):
    """Per-date flag: too many missing (==0 or >=1) pixels.

    Returns a (T,) bool kill mask (True = date should be dropped),
    restricted to valid slots.
    """
    bands = s2[..., :10]
    missing = (jnp.sum(bands == 0.0, axis=-1)
               + jnp.sum(bands >= 1.0, axis=-1))
    px_bad = jnp.sum(missing > 1.0, axis=(1, 2))
    limit = (s2.shape[1] ** 2) / thresh
    return jnp.logical_and(px_bad >= limit, valid)


@jax.jit
def fill_extremes_with_median(arr, valid):
    """Replace 0-valued and >=1-valued pixels with the temporal median of
    valid dates (reference: download_and_predict_job.py:1039-1047)."""
    med = masked_median(arr, valid)
    bad = jnp.logical_or(arr == 0.0, arr == 1.0)
    return jnp.where(bad, med[None], arr)


@jax.jit
def fill_nan_with_median(arr, valid):
    """Replace NaNs with the temporal median (median of non-NaN valid
    dates; residual NaNs become 0)."""
    from ttc.ops.sortnet import masked_median_axis0

    finite = jnp.isfinite(arr)
    ok = jnp.logical_and(finite, valid[:, None, None, None])
    med, empty = masked_median_axis0(arr, jnp.logical_not(ok))
    med = jnp.where(empty, 0.0, med)
    return jnp.where(finite, arr, med[None])


@partial(jax.jit, static_argnames=("limit",))
def id_nan_dates(arr, valid, limit: int = 0):
    """Kill mask for dates with more than `limit` NaN pixels."""
    n_nan = jnp.sum(jnp.logical_not(jnp.isfinite(arr)), axis=(1, 2, 3))
    return jnp.logical_and(n_nan > limit, valid)
