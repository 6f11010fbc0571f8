"""Cloud/shadow gap-filling: feathered weights, aligned mosaic, blend.

Re-implements id_areas_to_interp, make_aligned_mosaic,
align_interp_array and remove_cloud_and_shadows
(reference: src/preprocessing/cloud_removal.py:774-798,578-699,316-577,
888-973) as batched device ops.

The reference's per-date sklearn LinearRegression(positive=True,
fit_intercept=False) alignment is replaced by a closed-form
non-negative least squares approximation (normal-equation solve with
negatives clipped then rescaled) computed on stratified co-clear
pixels — an intentional deviation verified on final tree-cover output
rather than internal equality (SURVEY.md "sklearn-in-the-loop").
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ttc.ops.morphology import capped_edt, dilate, erode, grey_closing
from ttc.preprocess.clouds import EPS, ndwi, snow_filter

N_ALIGN_FEATURES = 11  # 10 bands + snow probability

# Stage boundaries are jitted: on backends with per-op dispatch latency
# (the axon tunnel) eager execution of these many-op stages costs
# seconds of round-trips even though device time is milliseconds.


@partial(jax.jit, static_argnames=("feather_px", "closing"))
def interp_weights(cloud_mask, feather_px: float = 12.0,
                   closing: int = 15):
    """Soft interpolation weights from a binary cloud/shadow mask:
    capped-EDT feather over `feather_px`, <0.2 zeroed, grey-closed
    (reference id_areas_to_interp :774-798; remove_cloud_and_shadows
    uses closing=20 :913-921)."""
    mask = jnp.clip(cloud_mask.astype(jnp.float32), 0.0, 1.0)
    dist = capped_edt(mask > 0, feather_px)
    blurred = 1.0 - dist / feather_px
    blurred = jnp.where(blurred < 0.2, 0.0, blurred)
    blurred = grey_closing(blurred, closing)
    # dates with no mask at all stay all-zero
    has_any = jnp.sum(mask, axis=(-2, -1), keepdims=True) > 0
    return jnp.where(has_any, blurred, 0.0)


def water_mask_morph(arr):
    """Median-NDWI water mask, eroded 2 then dilated 5
    (reference make_aligned_mosaic :583-586)."""
    wm = jnp.median(ndwi(arr), axis=0) > 0
    return dilate(erode(wm.astype(jnp.float32), 2), 5)


@jax.jit
def make_aligned_mosaic(arr, interp):
    """Cloud-free reference composite (reference :578-699).

    Per-date mean/std alignment to the cross-date average over co-clear
    land pixels, clear-weighted sum, NaN-fill with the 10th percentile,
    clamped to the per-pixel stack envelope.
    """
    t_total = arr.shape[0]
    wm = water_mask_morph(arr)
    clear = (interp < 0.25) & (wm == 0)          # (T, H, W)

    divisor = jnp.sum(1.0 - interp, axis=0)[..., None]

    # O(T) sufficient statistics: the per-date "sum of other dates over
    # pixels clear at i" factorizes as clear_i * (S_all - arr_i * M_i)
    # because the b-mask (interp[b] < 1) does not depend on i — an
    # exact collapse of the previous O(T^2) accumulation
    m_all = (interp < 1)[..., None].astype(arr.dtype)   # (T, H, W, 1)
    s_all = jnp.sum(arr * m_all, axis=0)                # (H, W, C)
    c_all = jnp.sum(m_all, axis=0)                      # (H, W, 1)

    mosaic = jnp.zeros_like(arr[0])
    for i in range(t_total):
        ci = clear[i][..., None].astype(arr.dtype)
        other_sum = (s_all - arr[i] * m_all[i]) * ci
        other_cnt = (c_all - m_all[i]) * ci
        ref_px = (clear[i] & (other_cnt[..., 0] > 0))[..., None]

        n_ref = jnp.sum(ref_px)
        ref_vals = jnp.where(ref_px, other_sum
                             / jnp.maximum(other_cnt, 1.0), jnp.nan)
        src_vals = jnp.where(ref_px, arr[i], jnp.nan)

        mean_ref = jnp.nanmedian(
            ref_vals.reshape(-1, arr.shape[-1]), axis=0)
        std_ref = _nanstd(ref_vals.reshape(-1, arr.shape[-1]))
        mean_src = jnp.nanmedian(
            src_vals.reshape(-1, arr.shape[-1]), axis=0)
        std_src = _nanstd(src_vals.reshape(-1, arr.shape[-1]))

        std_mult = std_ref / jnp.maximum(std_src, EPS)
        addition = mean_ref - mean_src * std_mult
        aligned = jnp.where((wm == 0)[..., None],
                            arr[i] * std_mult + addition, arr[i])
        # skip dates with too few co-clear samples (reference >1000 px)
        usable = n_ref > 1000
        increment = jnp.where(usable,
                              (1.0 - interp[i][..., None]) * aligned, 0.0)
        mosaic = mosaic + increment
        divisor = jnp.where(usable, divisor,
                            divisor - (1.0 - interp[i][..., None]))

    divisor = jnp.maximum(divisor, 0.0)
    mosaic = mosaic / jnp.maximum(divisor, EPS)
    fallback = jnp.percentile(arr, 10, axis=0)
    mosaic = jnp.where(jnp.isfinite(mosaic) & (divisor > 0), mosaic,
                       fallback)
    mosaic = jnp.clip(mosaic, jnp.min(arr, axis=0), jnp.max(arr, axis=0))
    return mosaic


def _nanstd(x):
    n = jnp.sum(jnp.isfinite(x), axis=0)
    mean = jnp.nanmean(x, axis=0)
    var = jnp.nansum((x - mean) ** 2, axis=0) / jnp.maximum(n, 1)
    return jnp.sqrt(var)


def _nnls_align(features, targets, sample_mask):
    """Closed-form approximation of LinearRegression(positive=True,
    fit_intercept=False): weighted normal equations, negatives clipped,
    solution rescaled to preserve the weighted mean prediction."""
    w = sample_mask.astype(features.dtype)[:, None]
    xtx = (features * w).T @ features
    xty = (features * w).T @ targets
    ridge = 1e-6 * jnp.trace(xtx) / features.shape[1]
    coef = jnp.linalg.solve(
        xtx + ridge * jnp.eye(features.shape[1]), xty)
    coef = jnp.maximum(coef, 0.0)
    # rescale so predictions keep the target's weighted mean
    pred_mean = jnp.sum((features @ coef) * w[:, 0][:, None], axis=0)
    targ_mean = jnp.sum(targets * w, axis=0)
    scale = targ_mean / jnp.maximum(pred_mean, EPS)
    return coef * scale[None, :]


def _evi_stratified_weights(targets, mask):
    """Sample weights reproducing the reference's EVI-equibatch
    (reference :453-496): equal mass per EVI quintile with the <2% and
    >98% tails boosted 10x. Deterministic weighting instead of random
    index resampling."""
    from ttc.ops.indices import evi

    e = evi(targets)
    big = jnp.where(mask, e, jnp.nan)
    edges = jnp.nanpercentile(big, jnp.asarray([2.0, 20.0, 40.0, 60.0,
                                                80.0, 98.0]))
    bins = jnp.zeros_like(e, dtype=jnp.int32)
    for k in range(5):
        bins = jnp.where(e >= edges[k], k + 1, bins)
    counts = jnp.stack([
        jnp.sum(mask & (bins == k)) for k in range(6)]).astype(
        jnp.float32)
    inv = 1.0 / jnp.maximum(counts, 1.0)
    w = inv[bins]
    # tail boosts
    w = jnp.where(e < edges[0], w + 10.0 * inv[0] * (e < edges[0]), w)
    w = jnp.where(e >= edges[5], w * 10.0, w)
    return w * mask


def align_mosaic_to_date(arr, mosaic, interp, date: int, water_mask,
                         snow):
    """Predict date-`date` appearance of the mosaic from co-clear pixels
    of dates t-1..t+1, EVI-stratified (reference align_interp_array
    :316-575)."""
    t_total = arr.shape[0]
    lo = max(date - 1, 0) if date != t_total - 1 else max(date - 2, 0)
    hi = min(date + 2, t_total)

    feats = jnp.concatenate([mosaic, snow], axis=-1) \
        .reshape(-1, N_ALIGN_FEATURES)
    n_px = feats.shape[0]

    # stack co-clear samples of the neighbor window
    f_parts = []
    t_parts = []
    m_parts = []
    for t in range(lo, hi):
        mask = ((interp[t] == 0) & (water_mask < 1)).reshape(-1)
        f_parts.append(feats)
        t_parts.append(arr[t].reshape(-1, arr.shape[-1]))
        m_parts.append(mask)
    x = jnp.concatenate(f_parts, axis=0)
    y = jnp.concatenate(t_parts, axis=0)
    m = jnp.concatenate(m_parts, axis=0)
    m = _evi_stratified_weights(y, m)

    coef = _nnls_align(x, y, m)
    pred = (feats @ coef).reshape(mosaic.shape[:-1] + (arr.shape[-1],))
    region = ((interp[date] > 0) & (water_mask <= 1))[..., None]
    return jnp.where(region, pred, mosaic[..., :arr.shape[-1]])


def calculate_clouds_in_mosaic(mosaic, interp, pfcps):
    """Residual-cloud weight for single-image areas
    (reference :703-732)."""
    only_1 = jnp.sum(1.0 - (interp > 0), axis=0) < 2
    p = pfcps[0] if pfcps.ndim == 3 else pfcps
    p = dilate(p, 10)
    only_1 = jnp.maximum(only_1.astype(jnp.float32), p)

    keep = only_1 == 0
    ref_blue = _masked_percentile(mosaic[..., 0], keep, 99.0)
    ref_red = _masked_percentile(mosaic[..., 2], keep, 99.0)
    cim = ((mosaic[..., 0] > ref_blue)
           & (mosaic[..., 2] > ref_red)
           & (only_1 > 0)
           & (jnp.sum(mosaic[..., :3], axis=-1) < 1.0)) \
        .astype(jnp.float32)
    cim = jnp.where(p > 0, 0.0, cim)
    cim = dilate(erode(cim, 3), 8)
    # degenerate case: everything single-image
    return jnp.where(jnp.all(only_1 > 0), jnp.zeros_like(cim), cim)


def _masked_percentile(x, keep, pct):
    flat = x.ravel()
    k = keep.ravel()
    srt = jnp.sort(jnp.where(k, flat, jnp.inf))
    n = jnp.maximum(jnp.sum(k.astype(jnp.int32)), 1)
    idx = jnp.clip((pct / 100.0 * (n - 1)).astype(jnp.int32), 0, n - 1)
    return srt[idx]


@jax.jit
def remove_cloud_and_shadows(tiles, cloud_shadow, pfcps):
    """Full gap-fill (reference :888-973): feathered weights -> aligned
    mosaic -> per-date aligned blend. Returns
    (filled_tiles, interp_weights, fully_interpolated_mask)."""
    interp = interp_weights(cloud_shadow, 12.0, closing=20)
    mosaic = make_aligned_mosaic(tiles, interp)

    wm = ndwi(jnp.median(tiles, axis=0)) > 0
    snow = jnp.mean(snow_filter(tiles), axis=0)[..., None]

    t_total = tiles.shape[0]
    out = []
    for date in range(t_total):
        aligned = align_mosaic_to_date(tiles, mosaic, interp, date, wm,
                                       snow)
        w = interp[date][..., None]
        out.append(tiles[date] * (1.0 - w) + aligned * w)
    filled = jnp.stack(out)

    cim = calculate_clouds_in_mosaic(mosaic, interp, pfcps)
    interp = jnp.clip(interp + cim[None], 0.0, 1.0)
    fully_interp = jnp.mean(interp == 1, axis=(1, 2)) == 1
    return filled, interp, fully_interp
