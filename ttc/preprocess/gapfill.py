"""Cloud/shadow gap-filling: feathered weights, aligned mosaic, blend.

Re-implements id_areas_to_interp, make_aligned_mosaic,
align_interp_array and remove_cloud_and_shadows
(reference: src/preprocessing/cloud_removal.py:774-798,578-699,316-577,
888-973) as batched device ops.

The reference's per-date sklearn LinearRegression(positive=True,
fit_intercept=False) alignment (= Lawson-Hanson NNLS) is solved
exactly on device with accelerated projected gradient (FISTA) on the
weighted normal equations — a fixed-iteration, jit-compatible program
that converges to the same KKT point as scipy.optimize.nnls for this
11-feature system (tests/test_nnls.py), computed on stratified
co-clear pixels (SURVEY.md "sklearn-in-the-loop").
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ttc.ops.morphology import capped_edt, dilate, erode, grey_closing
from ttc.ops.sortnet import (
    masked_median,
    masked_median_axis0,
    masked_quantile,
    median_axis0,
    quantile_axis0,
)
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


def water_mask_morph(arr, valid=None):
    """Median-NDWI water mask, eroded 2 then dilated 5
    (reference make_aligned_mosaic :583-586)."""
    if valid is None:
        wm = median_axis0(ndwi(arr)) > 0
    else:
        med, _ = masked_median_axis0(ndwi(arr), ~valid[:, None, None])
        wm = med > 0
    return dilate(erode(wm.astype(jnp.float32), 2), 5)


@jax.jit
def make_aligned_mosaic(arr, interp, valid=None):
    """Cloud-free reference composite (reference :578-699).

    Per-date mean/std alignment to the cross-date average over co-clear
    land pixels, clear-weighted sum, NaN-fill with the 10th percentile,
    clamped to the per-pixel stack envelope. Fully batched over dates;
    the per-date co-clear medians run as radix selects instead of
    full-image XLA sorts (exact, ~15x cheaper on TPU). Invalid slots
    (interp == 1 everywhere) drop out of the statistics automatically;
    `valid` only gates the fallback/envelope reductions.
    """
    t_total, h, w, c = arr.shape
    wm = water_mask_morph(arr, valid)
    clear = (interp < 0.25) & (wm == 0)          # (T, H, W)

    # O(T) sufficient statistics: the per-date "sum of other dates over
    # pixels clear at i" factorizes as clear_i * (S_all - arr_i * M_i)
    # because the b-mask (interp[b] < 1) does not depend on i — an
    # exact collapse of the previous O(T^2) accumulation
    m_all = (interp < 1)[..., None].astype(arr.dtype)   # (T, H, W, 1)
    s_all = jnp.sum(arr * m_all, axis=0)                # (H, W, C)
    c_all = jnp.sum(m_all, axis=0)                      # (H, W, 1)

    ci = clear[..., None].astype(arr.dtype)             # (T, H, W, 1)
    other_sum = (s_all[None] - arr * m_all) * ci        # (T, H, W, C)
    other_cnt = (c_all[None] - m_all) * ci              # (T, H, W, 1)
    ref_px = clear & (other_cnt[..., 0] > 0)            # (T, H, W)
    n_ref = jnp.sum(ref_px, axis=(1, 2))                # (T,)

    ref_vals = (other_sum / jnp.maximum(other_cnt, 1.0)) \
        .reshape(t_total, h * w, c)
    src_vals = arr.reshape(t_total, h * w, c)
    keep = ref_px.reshape(t_total, h * w, 1)

    mean_ref, _ = masked_median(ref_vals, keep, axis=1)  # (T, C)
    mean_src, _ = masked_median(src_vals, keep, axis=1)
    std_ref = _masked_std(ref_vals, keep)
    std_src = _masked_std(src_vals, keep)

    std_mult = (std_ref / jnp.maximum(std_src, EPS))[:, None, None]
    addition = (mean_ref - mean_src * std_mult[:, 0, 0])[:, None, None]
    aligned = jnp.where((wm == 0)[None, ..., None],
                        arr * std_mult + addition, arr)
    # skip dates with too few co-clear samples (reference >1000 px)
    usable = (n_ref > 1000)[:, None, None, None]
    weight = (1.0 - interp)[..., None]
    mosaic = jnp.sum(jnp.where(usable, weight * aligned, 0.0), axis=0)
    divisor = jnp.sum(jnp.where(usable, weight, 0.0), axis=0)

    divisor = jnp.maximum(divisor, 0.0)
    mosaic = mosaic / jnp.maximum(divisor, EPS)
    if valid is None:
        fallback = quantile_axis0(arr, 10.0)
        env_lo, env_hi = jnp.min(arr, axis=0), jnp.max(arr, axis=0)
    else:
        from ttc.ops.sortnet import (masked_max_axis0, masked_min_axis0,
                                     masked_quantile_axis0)

        bad4 = ~valid[:, None, None, None]
        fallback = masked_quantile_axis0(arr, bad4, 10.0)
        env_lo, _ = masked_min_axis0(arr, bad4)
        env_hi, _ = masked_max_axis0(arr, bad4)
    mosaic = jnp.where(jnp.isfinite(mosaic) & (divisor > 0), mosaic,
                       fallback)
    mosaic = jnp.clip(mosaic, env_lo, env_hi)
    return mosaic


def _masked_std(x, keep):
    """Population std over axis 1 counting only `keep` entries —
    the masked equivalent of the previous NaN-fill _nanstd."""
    k = jnp.broadcast_to(keep, x.shape).astype(x.dtype)
    n = jnp.maximum(jnp.sum(k, axis=1), 1.0)
    mean = jnp.sum(x * k, axis=1) / n
    var = jnp.sum((x - mean[:, None]) ** 2 * k, axis=1) / n
    return jnp.sqrt(var)


def nnls_gram(xtx, xty, n_iters: int = 300):
    """Non-negative least squares from the Gram system: minimize
    0.5 c'Ac - b'c s.t. c >= 0, via FISTA projected gradient — the
    jit-compatible equivalent of sklearn LinearRegression(positive=True,
    fit_intercept=False) / scipy.optimize.nnls (reference
    cloud_removal.py:553-555). A = xtx is (F, F); b = xty is (F,) or
    (F, C) — all C target columns solved simultaneously. Step size
    1/L with L from 20 power iterations; fixed n_iters keeps the
    program static under jit."""
    f = xtx.shape[0]
    b = xty if xty.ndim == 2 else xty[:, None]

    # Lipschitz constant of the gradient = lambda_max(A), power iter
    def power(v, _):
        v = xtx @ v
        return v / jnp.maximum(jnp.linalg.norm(v), EPS), None

    v0 = jnp.ones((f,), xtx.dtype) / jnp.sqrt(float(f))
    v, _ = jax.lax.scan(power, v0, None, length=20)
    lip = jnp.maximum(v @ (xtx @ v), EPS)

    def step(carry, _):
        c, y, t = carry
        grad = xtx @ y - b
        c_new = jnp.maximum(y - grad / lip, 0.0)
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        y_new = c_new + ((t - 1.0) / t_new) * (c_new - c)
        return (c_new, y_new, t_new), None

    c0 = jnp.zeros_like(b)
    (c, _, _), _ = jax.lax.scan(step, (c0, c0, jnp.ones((), xtx.dtype)),
                                None, length=n_iters)
    return c if xty.ndim == 2 else c[:, 0]


def _nnls_align(features, targets, sample_mask):
    """Exact weighted NNLS fit of targets from features — the
    reference's per-band LinearRegression(positive=True,
    fit_intercept=False) (cloud_removal.py:553-555), with the
    stratified sample weights folded into the Gram system instead of
    index resampling."""
    w = sample_mask.astype(features.dtype)[:, None]
    xtx = (features * w).T @ features
    xty = (features * w).T @ targets
    # tiny ridge for rank-deficient co-clear sets (all-masked bands)
    ridge = 1e-7 * jnp.trace(xtx) / features.shape[1]
    xtx = xtx + ridge * jnp.eye(features.shape[1], dtype=xtx.dtype)
    return nnls_gram(xtx, xty)


def _evi_stratified_weights(targets, mask):
    """Sample weights reproducing the reference's EVI-equibatch
    (reference :453-496): equal mass per EVI quintile with the <2% and
    >98% tails boosted 10x. Deterministic weighting instead of random
    index resampling."""
    from ttc.ops.indices import evi

    e = evi(targets)
    edges = masked_quantile(e, mask, np.asarray([2.0, 20.0, 40.0, 60.0,
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
                         snow, rank=None, n=None, pos=None):
    """Predict date-`date` appearance of the mosaic from co-clear pixels
    of dates t-1..t+1, EVI-stratified (reference align_interp_array
    :316-575). With rank info the neighbor window lives in valid-rank
    space (fixed 3 slots, out-of-window slots zero-weighted)."""
    t_total = arr.shape[0]
    if rank is None:
        from ttc.preprocess.clouds import _rank_info

        rank, n, pos = _rank_info(jnp.ones(t_total, bool))

    r = rank[date]
    lo = jnp.where(r == n - 1, jnp.maximum(r - 2, 0),
                   jnp.maximum(r - 1, 0))
    hi = jnp.minimum(r + 2, n)
    ks = lo + jnp.arange(3)
    slots = pos[jnp.clip(ks, 0, jnp.maximum(n - 1, 0))]
    in_win = ks < hi

    feats = jnp.concatenate([mosaic, snow], axis=-1) \
        .reshape(-1, N_ALIGN_FEATURES)

    # co-clear samples of the (gathered) neighbor window
    win_arr = arr[slots]                                # (3, H, W, C)
    win_interp = interp[slots]                          # (3, H, W)
    masks = ((win_interp == 0) & (water_mask < 1)[None]
             & in_win[:, None, None])
    x = jnp.concatenate([feats] * 3, axis=0)
    y = win_arr.reshape(-1, arr.shape[-1])
    m = masks.reshape(-1)
    m = _evi_stratified_weights(y, m)

    coef = _nnls_align(x, y, m)
    pred = (feats @ coef).reshape(mosaic.shape[:-1] + (arr.shape[-1],))
    region = ((interp[date] > 0) & (water_mask <= 1))[..., None]
    return jnp.where(region, pred, mosaic[..., :arr.shape[-1]])


def calculate_clouds_in_mosaic(mosaic, interp, pfcps, first_idx=0):
    """Residual-cloud weight for single-image areas
    (reference :703-732). `first_idx` selects the first *valid* date's
    fcp plane for fixed-capacity stacks."""
    only_1 = jnp.sum(1.0 - (interp > 0), axis=0) < 2
    p = pfcps[first_idx] if pfcps.ndim == 3 else pfcps
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
    """k-th order statistic at floor(pct/100*(n-1)) of the kept set —
    the previous sort-and-index semantics, via radix select."""
    from ttc.ops.sortnet import masked_kth

    flat = x.ravel()
    k = keep.ravel()
    n = jnp.maximum(jnp.sum(k.astype(jnp.int32)), 1)
    idx = jnp.clip((pct / 100.0 * (n - 1)).astype(jnp.int32), 0, n - 1)
    return masked_kth(flat, k, idx)


@jax.jit
def remove_cloud_and_shadows(tiles, cloud_shadow, pfcps, valid=None):
    """Full gap-fill (reference :888-973): feathered weights -> aligned
    mosaic -> per-date aligned blend. Returns
    (filled_tiles, interp_weights, fully_interpolated_mask).

    With `valid`, invalid slots (all-cloud masks) drop out of every
    statistic; their filled rows are zeroed and their interp forced to
    1 so rcs(s2, cs, fcps, valid)[valid] == rcs(s2[v], cs[v], fcps[v])
    exactly (tested)."""
    from ttc.preprocess.clouds import _rank_info

    t_total = tiles.shape[0]
    if valid is None:
        valid = jnp.ones(t_total, bool)
    valid = valid.astype(bool)
    rank, n, pos = _rank_info(valid)

    interp = interp_weights(cloud_shadow, 12.0, closing=20)
    mosaic = make_aligned_mosaic(tiles, interp, valid)

    med, _ = masked_median_axis0(tiles, ~valid[:, None, None, None])
    wm = ndwi(med) > 0
    nf = jnp.maximum(n.astype(tiles.dtype), 1.0)
    snow = (jnp.sum(snow_filter(tiles) * valid[:, None, None], axis=0)
            / nf)[..., None]

    out = []
    for date in range(t_total):
        aligned = align_mosaic_to_date(tiles, mosaic, interp, date, wm,
                                       snow, rank, n, pos)
        w = interp[date][..., None]
        out.append(tiles[date] * (1.0 - w) + aligned * w)
    filled = jnp.stack(out)
    filled = jnp.where(valid[:, None, None, None], filled, 0.0)

    cim = calculate_clouds_in_mosaic(mosaic, interp, pfcps,
                                     first_idx=pos[0])
    interp = jnp.clip(interp + cim[None], 0.0, 1.0)
    interp = jnp.where(valid[:, None, None], interp, 1.0)
    fully_interp = jnp.mean(interp == 1, axis=(1, 2)) == 1
    return filled, interp, fully_interp
