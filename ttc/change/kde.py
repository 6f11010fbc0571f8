"""Stable-pixel NDMI percentile calibration via gaussian KDE.

The reference evaluates a scipy gaussian_kde CDF on a regular grid per
image to find the 2.5/5/10/25% NDMI thresholds of stable pixels
(reference: src/change/change.py:245-297). The CDF of a gaussian KDE is

    cdf(g) = mean_i ndtr((g - x_i) / h)

— an (G x N) broadcastable op that the TPU evaluates in one fused pass
for the whole grid and every image simultaneously, instead of a Python
loop of per-item ndtr calls.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

REG_GRID = np.arange(-10000, 10000, 20, dtype=np.float32)


def scott_factor(n: int) -> float:
    """scipy.stats.gaussian_kde default bandwidth factor (d=1)."""
    return n ** (-1.0 / 5.0)


def kde_cdf(samples, grid=None):
    """(N,) samples -> CDF evaluated on the grid.

    Matches the reference exactly: ndtr((g - x_i) / kde.factor).mean()
    where kde.factor is scipy's *unitless* Scott factor n^(-1/5)
    (reference: change.py:248-251 divides by the factor alone, not
    factor * std — effectively an ECDF with a sub-unit bandwidth on
    int16 NDMI data; replicated as-is).
    """
    grid = jnp.asarray(REG_GRID if grid is None else grid,
                       jnp.float32)
    samples = jnp.asarray(samples, jnp.float32)
    n = samples.shape[0]
    h = scott_factor(n)
    z = (grid[:, None] - samples[None, :]) / h
    return jnp.mean(jax.scipy.special.ndtr(z), axis=1)


def percentile_threshold(cdf, fraction, grid=None):
    """Grid value whose CDF is closest to `fraction`
    (reference :252-255)."""
    grid = jnp.asarray(REG_GRID if grid is None else grid, jnp.float32)
    return grid[jnp.argmin(jnp.abs(cdf - fraction))]


def calibrate_image(ard_step, ref_samples, multiplier: float = 1.0):
    """One image -> (f, m, b, h, percentiles): boolean exceedance maps of
    the 5/10/25/2.5% stable-pixel thresholds plus the 5%-step
    percentile raster (reference make_and_analyze_kde_for_one_img
    :245-269)."""
    cdf = kde_cdf(ref_samples)
    t2 = percentile_threshold(cdf, 0.025 * multiplier)
    t5 = percentile_threshold(cdf, 0.05 * multiplier)
    t10 = percentile_threshold(cdf, 0.1 / multiplier)
    t25 = percentile_threshold(cdf, 0.25)

    f = ard_step >= t5
    m = ard_step >= t10
    b = ard_step >= t25
    hi = ard_step >= t2

    pct = jnp.zeros_like(ard_step, dtype=jnp.float32)
    for i in range(0, 100, 5):
        thresh = percentile_threshold(cdf, i / 100.0)
        pct = jnp.where(ard_step >= thresh, i / 100.0, pct)
    return f, m, b, hi, pct


@jax.jit
def _calibrate_stack(ard_f32, samples, multiplier):
    """Device-side loop over images: one dispatch for the whole stack.
    lax.map (not vmap) keeps the (grid x samples) ndtr matrix at
    per-image size — sequential images are free, the per-image op is
    already wide enough to saturate the chip."""
    def body(args):
        a, s = args
        return calibrate_image(a, s, multiplier)

    return jax.lax.map(body, (ard_f32, samples))


def make_all_kde(ard, stable, maxpx: int = 36000,
                 multiplier: float = 1.0, seed: int = 0):
    """(T, H, W) int16 NDMI stack + (H, W) stable mask ->
    (kde5, kde10, kde25, kde2.5, percentiles) stacks
    (reference make_all_kde :271-297). The reference evaluates scipy
    gaussian_kde per image in a Python loop; here the whole stack is
    calibrated in one jitted device call."""
    ard = np.asarray(ard)
    stable_px = ard[:, stable]                       # (T, n_stable)
    n = stable_px.shape[1]
    rng = np.random.default_rng(seed)
    sample_idx = rng.integers(0, n, min(maxpx, n))
    samples = stable_px[:, sample_idx]               # (T, S)

    f, m, b, h, pct = _calibrate_stack(
        jnp.asarray(ard, jnp.float32),
        jnp.asarray(samples, jnp.float32),
        jnp.float32(multiplier))
    return (np.asarray(f), np.asarray(m), np.asarray(b),
            np.asarray(h), np.asarray(pct))
