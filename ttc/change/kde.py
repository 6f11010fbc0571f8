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


def kde_cdf(samples, grid=None, n_valid=None):
    """(N,) samples -> CDF evaluated on the grid.

    Matches the reference exactly: ndtr((g - x_i) / kde.factor).mean()
    where kde.factor is scipy's *unitless* Scott factor n^(-1/5)
    (reference: change.py:248-251 divides by the factor alone, not
    factor * std — effectively an ECDF with a sub-unit bandwidth on
    int16 NDMI data; replicated as-is).

    `n_valid` (optional traced scalar) supports fixed-width batched
    sample rows: pad columns with +inf (ndtr -> 0) and pass the real
    count — the mean then uses n_valid exactly as the unpadded call
    would. `h_override` must accompany it: the host-side float64
    Scott factor (device float32 pow of n_valid would diverge from
    the single-tile path's Python-float bandwidth).
    """
    grid = jnp.asarray(REG_GRID if grid is None else grid,
                       jnp.float32)
    samples = jnp.asarray(samples, jnp.float32)
    if n_valid is None:
        h = scott_factor(samples.shape[0])
        nv = float(samples.shape[0])
    else:
        nv, h = n_valid
    z = (grid[:, None] - samples[None, :]) / h
    return jnp.sum(jax.scipy.special.ndtr(z), axis=1) / nv


def percentile_threshold(cdf, fraction, grid=None):
    """Grid value whose CDF is closest to `fraction`
    (reference :252-255)."""
    grid = jnp.asarray(REG_GRID if grid is None else grid, jnp.float32)
    return grid[jnp.argmin(jnp.abs(cdf - fraction))]


def calibrate_image(ard_step, ref_samples, multiplier: float = 1.0,
                    n_valid=None):
    """One image -> (f, m, b, h, percentiles): boolean exceedance maps of
    the 5/10/25/2.5% stable-pixel thresholds plus the 5%-step
    percentile raster (reference make_and_analyze_kde_for_one_img
    :245-269)."""
    cdf = kde_cdf(ref_samples, n_valid=n_valid)
    t2 = percentile_threshold(cdf, 0.025 * multiplier)
    t5 = percentile_threshold(cdf, 0.05 * multiplier)
    t10 = percentile_threshold(cdf, 0.1 / multiplier)
    t25 = percentile_threshold(cdf, 0.25)

    f = ard_step >= t5
    m = ard_step >= t10
    b = ard_step >= t25
    hi = ard_step >= t2

    # percentile raster carried as uint8 percent (5%-steps are exact
    # multiples, so the /100 decode after readback is bit-identical to
    # emitting f32 on device — and the host link moves 4x fewer bytes)
    pct = jnp.zeros_like(ard_step, dtype=jnp.uint8)
    for i in range(0, 100, 5):
        thresh = percentile_threshold(cdf, i / 100.0)
        pct = jnp.where(ard_step >= thresh, jnp.uint8(i), pct)
    return f, m, b, hi, pct


@jax.jit
def _calibrate_stack(ard_f32, samples, n_valid, h, multiplier):
    """Device-side loop over images: one dispatch for the whole stack.
    lax.map (not vmap) keeps the (grid x samples) ndtr matrix at
    per-image size — sequential images are free, the per-image op is
    already wide enough to saturate the chip. Sample rows are
    fixed-width (+inf padded, ndtr -> 0); n_valid / h are the
    per-image real count and host-computed Scott bandwidth, so single
    tiles and multi-tile batches share ONE compiled program and
    produce identical values."""
    def body(args):
        a, s, nv, hh = args
        return calibrate_image(a, s, multiplier, n_valid=(nv, hh))

    return jax.lax.map(body, (ard_f32, samples, n_valid, h))


def _sample_stable(ard, stable, maxpx: int, seed: int):
    """Per-tile stable-pixel sample rows, padded/tiled to exactly
    `maxpx` columns so multi-tile batches share one shape. Samples
    flat indices first and gathers only those columns — identical
    values/order to `ard[:, stable][:, sample_idx]` (boolean indexing
    enumerates True positions in row-major flatnonzero order) without
    materializing the (T, n_stable) intermediate."""
    flat = np.flatnonzero(np.asarray(stable).ravel())
    n = flat.shape[0]
    rng = np.random.default_rng(seed)
    sample_idx = rng.integers(0, n, min(maxpx, n))
    t = ard.shape[0]
    return ard.reshape(t, -1)[:, flat[sample_idx]]   # (T, S<=maxpx)


def make_all_kde(ard, stable, maxpx: int = 36000,
                 multiplier: float = 1.0, seed: int = 0,
                 readback: bool = True):
    """(T, H, W) int16 NDMI stack + (H, W) stable mask ->
    (kde5, kde10, kde25, kde2.5, percentiles) stacks
    (reference make_all_kde :271-297). The reference evaluates scipy
    gaussian_kde per image in a Python loop; here the whole stack is
    calibrated in one jitted device call — the single-tile case of
    make_all_kde_many, so fleets can batch tiles with identical
    per-tile results. readback=False keeps the stacks on device (see
    make_all_kde_many)."""
    return make_all_kde_many([ard], [stable], maxpx=maxpx,
                             multiplier=multiplier, seed=seed,
                             readback=readback)[0]


def make_all_kde_many(ards, stables, maxpx: int = 36000,
                      multiplier: float = 1.0, seed: int = 0,
                      readback: bool = True):
    """Multi-tile KDE calibration in ONE device dispatch.

    ards: list of (T_i, H, W) NDMI stacks (shared spatial geometry);
    stables: matching list of (H, W) stable masks. Per-image
    calibration is independent, so all tiles' images flatten into one
    (sum T_i, H, W) stack and run through one jitted lax.map — results
    match make_all_kde(ard_i, stable_i, seed=seed + i) per tile
    (tests/test_change.py). Tiles with fewer stable pixels than maxpx
    get +inf-padded sample rows with the real count threaded through
    (ndtr -> 0; bandwidth and mean use the true n), so mixed-size
    tiles share one compiled shape. Amortizes dispatch/readback
    latency when the change fleet processes tiles in groups.

    readback=False keeps the four boolean exceedance stacks (and pct)
    ON DEVICE as jax array slices — ~137 MB/tile that the
    device-resident candidate stage (ttc.change.device) consumes
    without ever crossing the host link; callers np.asarray exactly
    what they need (the pct raster decodes to fractions via /100)."""
    counts = [np.asarray(a).shape[0] for a in ards]
    samples, n_valid = [], []
    for i, (a, st) in enumerate(zip(ards, stables)):
        smp = _sample_stable(np.asarray(a), st, maxpx,
                             seed + i).astype(np.float32)
        n_valid.extend([smp.shape[1]] * smp.shape[0])
        if smp.shape[1] < maxpx:
            smp = np.pad(smp, ((0, 0), (0, maxpx - smp.shape[1])),
                         constant_values=np.inf)
        samples.append(smp)
    flat_ard = np.concatenate([np.asarray(a) for a in ards], axis=0)
    flat_smp = np.concatenate(samples, axis=0)

    f, m, b, h, pct = _calibrate_stack(
        jnp.asarray(flat_ard, jnp.float32),
        jnp.asarray(flat_smp, jnp.float32),
        jnp.asarray(n_valid, jnp.float32),
        jnp.asarray([scott_factor(n) for n in n_valid], jnp.float32),
        jnp.float32(multiplier))
    outs = []
    start = 0
    for t in counts:
        sl = slice(start, start + t)
        if not readback:
            outs.append((f[sl], m[sl], b[sl], h[sl], pct[sl]))
        else:
            # uint8-percent wire -> f32 fractions (exact: 5%-step
            # values round-trip bit-identically through /100)
            pct_f = np.asarray(pct[sl]).astype(np.float32) \
                / np.float32(100.0)
            outs.append((np.asarray(f[sl]), np.asarray(m[sl]),
                         np.asarray(b[sl]), np.asarray(h[sl]), pct_f))
        start += t
    return outs
