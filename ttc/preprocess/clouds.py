"""Multi-temporal cloud and shadow masking — the heart of ARD creation.

Re-implements identify_clouds_shadows and detect_pfcp
(reference: src/preprocessing/cloud_removal.py:1215-1677,1109-1212) as a
fixed-shape, jittable device program. The reference is ~500 lines of
per-image Python loops over numpy; here every pass is batched over the
full (T, H, W, C) stack:

  1. Hollstein rule cloud seed, opened+dilated
  2. shadow candidates vs 5-window non-cloud median / max references
     (delta B8A / delta B11 / blue), slope-relaxed variant, water rules
  3. shadow morphology cleanup (open, distance-cap merge)
  4. cloud candidates vs darkest-pixel window composites with
     reflectance-scaled thresholds (Candra et al. 2020 style) inside a
     bounded threshold-relaxation loop (lax.while_loop)
  5. brightness z-score clouds (>3.5 sigma) with recurrence veto
  6. whiteness filter
  7. urban/parallax false-positive removal (Fmask 4.0 CDI), NIR/SWIR
     bright-surface and water NIR filters, 3x3 minority filter
  8. size-dependent dilation of urban vs non-urban clouds
  9. shadow-plausibility pruning, per-image false-negative shadow
     recovery (1/blue z-score), whole-image haze flag

Differences from the reference (documented intentional deviations):
- dates are fixed-capacity with a validity mask instead of np.delete;
  invalid dates are fully masked and report 100% cloud.
- capped euclidean distance transforms use the chamfer relaxation of
  ttc.ops.morphology (<4% metric deviation within the caps used).
- external ESA WorldCover urban/forest rasters are optional inputs
  (zeros when absent, like the reference's exception path).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ttc.ops.morphology import capped_edt, dilate, erode, maximum_filter
from ttc.ops.filters import mean_filter
from ttc.ops.sortnet import (
    masked_median,
    masked_median_axis0,
    masked_min_axis0,
    masked_quantile_axis0,
)

EPS = 1e-9


# ---------------------------------------------------------------- helpers

def ndwi(img):
    return (img[..., 1] - img[..., 3]) / (img[..., 1] + img[..., 3] + EPS)


def ndvi(img):
    return (img[..., 3] - img[..., 2]) / (img[..., 3] + img[..., 2] + EPS)


def ndbi(img):
    return (img[..., 8] - img[..., 3]) / (img[..., 8] + img[..., 3] + EPS)


def hollstein_seed(img, blue_thresh: float = 0.28):
    """Hollstein et al. 2016 fig. 6 rule mask per date, opened (erode 2)
    then dilated 10 (reference :1230-1242)."""
    rule = ((img[..., 7] > 0.166)
            & (img[..., 1] > blue_thresh)
            & (img[..., 5] / (img[..., 8] + EPS) < 4.292))
    return dilate(1.0 - dilate(1.0 - rule.astype(jnp.float32), 2), 10)


def winsum(x, size: int = 3):
    """Moving-window sum over the last two axes, reflect-padded
    (reference _winsum :1244-1249)."""
    return mean_filter(x, size) * (size * size)


def masked_max_t(data, bad_mask):
    bad = jnp.broadcast_to(bad_mask, data.shape)
    filled = jnp.where(bad, -jnp.inf, data)
    mx = jnp.max(filled, axis=0)
    return mx, jnp.all(bad, axis=0)


def masked_min_t(data, bad_mask):
    bad = jnp.broadcast_to(bad_mask, data.shape)
    filled = jnp.where(bad, jnp.inf, data)
    mn = jnp.min(filled, axis=0)
    return mn, jnp.all(bad, axis=0)


def masked_mean_std(x, keep):
    """Scalar mean/std of x over pixels where keep (guarding empties)."""
    k = keep.astype(x.dtype)
    n = jnp.maximum(jnp.sum(k), 1.0)
    mean = jnp.sum(x * k) / n
    var = jnp.sum((x - mean) ** 2 * k) / n
    return mean, jnp.sqrt(var)


# ------------------------------------------------ validity / rank space
#
# Dates are fixed-capacity slots with a (T,) `valid` mask; removed dates
# stay in place (SURVEY.md "dynamic date counts" design note). All
# temporal neighbor windows are computed in *valid-rank space* so that
# masking a date reproduces exactly what the reference's np.delete +
# re-run would compute: masker(s2[keep]) == masker(s2, valid=keep)[keep].

def _rank_info(valid):
    """rank: index of each slot among valid dates (garbage for invalid
    slots); n: valid count; pos: slot index of the k-th valid date
    (entries >= n are unset — clip rank offsets before indexing)."""
    t = valid.shape[0]
    v = valid.astype(jnp.int32)
    rank = jnp.cumsum(v) - 1
    n = jnp.sum(v)
    tgt = jnp.where(valid, rank, t)
    pos = jnp.zeros(t + 1, jnp.int32).at[tgt].set(
        jnp.arange(t, dtype=jnp.int32), mode="drop")[:t]
    return rank, n, pos


def _rank_window_gather(pos, n, lo, width: int):
    """Slot indices of the rank-space window [lo, lo+width) per date:
    (T, width) int32, clipped into the valid range."""
    rel = jnp.arange(width, dtype=jnp.int32)
    k = lo[:, None] + rel
    return pos[jnp.clip(k, 0, jnp.maximum(n - 1, 0))], k


# ---------------------------------------------------------- shadow pass

def _shadow_bounds(rank, n):
    """Rank-space [lower, upper) shadow windows (reference :1265-1272,
    with the 3-wide edge widening)."""
    l0 = jnp.maximum(0, rank - 4)
    u0 = jnp.minimum(n, rank + 3)
    c3 = (u0 - l0) == 3
    l1 = jnp.where(c3 & (u0 == n), jnp.maximum(l0 - 1, 0), l0)
    u1 = jnp.where(c3 & (l1 == 0), jnp.minimum(u0 + 1, n), u0)
    return l1, u1


_SH_WIN = 7  # max shadow window extent (t-4 .. t+3)


def _shadow_pass(img, clm, water_mask, dem, valid):
    """Per-date shadow candidates (reference :1265-1337).

    Fully vectorized over dates: the per-date neighbor windows are ONE
    gather into a (T, 7, H, W, 4) tensor and the masked window medians
    run as a min/max sorting network along the window axis — no XLA
    sort (which relayouts the stack and dominated masker time) and no
    sequential scan. Windows live in valid-rank space, so invalid
    slots are skipped exactly as the reference's np.delete would.
    """
    ref_bands = img[..., jnp.array([0, 1, 7, 8])]
    valid4 = valid[:, None, None, None]
    min_ref, _ = masked_min_axis0(ref_bands, ~valid4)

    # global non-cloud median reference (slope-relaxed variant);
    # clm is already forced to 1 on invalid slots
    med_all, empty_all = masked_median_axis0(
        ref_bands, (clm > 0)[..., None])
    med_plain, _ = masked_median_axis0(ref_bands, ~valid4)
    ri_global = jnp.where(empty_all, med_plain, med_all)

    rank, n, pos = _rank_info(valid)
    lo, up = _shadow_bounds(rank, n)
    widx, k = _rank_window_gather(pos, n, lo, _SH_WIN)     # (T, 7)
    in_win = k < up[:, None]                               # (T, 7)

    win = jnp.moveaxis(ref_bands[widx], 1, 0)              # (7,T,H,W,4)
    clm_w = jnp.moveaxis(clm[widx], 1, 0)                  # (7,T,H,W)
    bad = ((clm_w > 0)
           | ~in_win.T[:, :, None, None])[..., None]

    ri_med, empty = masked_median_axis0(win, bad)           # (T,H,W,4)
    ri_med = jnp.where(empty, min_ref, ri_med)
    ri_max = jnp.max(jnp.where(bad, -jnp.inf, win), axis=0)
    ri_max = jnp.where(jnp.all(bad, axis=0), min_ref, ri_max)

    b8a_t = img[..., 7]
    b11_t = img[..., 8]
    blue_t = img[..., 0]
    on_water = (water_mask > 0)[None]

    shadows = ((b8a_t - ri_med[..., 2] < -0.04)
               & (b11_t - ri_med[..., 3] < -0.04)
               & (blue_t < 0.09)
               & (blue_t - ri_med[..., 0] < -0.02)
               & (b8a_t < 0.17)).astype(jnp.float32)

    dark = ((b8a_t - ri_max[..., 2] < -0.04)
            & (b11_t - ri_max[..., 3] < -0.04)
            & (blue_t < 0.03) & (b8a_t < 0.18)).astype(jnp.float32)
    dark = jnp.where(on_water, 0.0, dark)
    shadows = jnp.maximum(shadows, dark)
    shadows = jnp.where(on_water, 0.0, shadows)

    # slope-relaxed: max reference, brighter blue limit, DEM >= 25
    slope_shadow = ((b8a_t - ri_max[..., 2] < -0.04)
                    & (b11_t - ri_max[..., 3] < -0.04)
                    & (blue_t < 0.07)
                    & (b8a_t < 0.18)
                    & (jnp.sum(img[..., :3], axis=-1) < 0.28)
                    ).astype(jnp.float32)
    slope_shadow = jnp.where(on_water, 0.0, slope_shadow)
    slope_shadow = slope_shadow * (dem >= 25)[None]
    shadows = jnp.maximum(shadows, slope_shadow)

    water_shadow = ((blue_t - ri_global[..., 0] < -0.05)
                    & (img[..., 1] - ri_global[..., 1] < -0.05)
                    & (b8a_t < 0.03)
                    & (ri_global[..., 1] - img[..., 1] > 0.02)
                    & on_water).astype(jnp.float32)
    shadows = shadows + water_shadow

    # morphology: open (erode 2, dilate 3), then merge shadows within
    # 5 px of each other via the capped distance transform (:1329-1337)
    sh = dilate(1.0 - dilate(1.0 - shadows, 2), 3)
    dist = capped_edt(sh > 0, 6.0)
    return (dist <= 5.0).astype(jnp.float32) * valid[:, None, None]


# ----------------------------------------------------------- cloud pass

def _cloud_bounds(rank, n):
    """Rank-space windows for the cloud pass: 'others' slice bounds,
    'close' index triples (+validity), and the 10-step widening bounds
    (reference :1343-1391), all traced so one compiled program serves
    every validity pattern."""
    l0 = jnp.maximum(0, rank - 2)
    u0 = jnp.minimum(n, rank + 3)
    c3 = (u0 - l0) == 3
    lo_o = jnp.where(c3 & (u0 == n), jnp.maximum(l0 - 2, 0), l0)
    up_o = jnp.where(c3 & (lo_o == 0), jnp.minimum(u0 + 2, n), u0)

    c0 = jnp.maximum(0, rank - 1)
    c1 = jnp.minimum(n - 1, rank + 1)
    narrow = (c1 - c0) < 2
    shift = jnp.where(c0 == 0, 1, -1)
    c0 = jnp.where(narrow, c0 + shift, c0)
    c1 = jnp.where(narrow, c1 + shift, c1)
    ext = (c1 >= n - 2) & (n > 3)
    e = c0 - 1
    # order is irrelevant downstream (masked min over the triple)
    close_idx = jnp.stack([e, c0, c1], axis=-1)            # (T, 3)
    close_valid = jnp.stack([ext & (e >= 0) & (e < n),
                             (c0 >= 0) & (c0 < n),
                             (c1 >= 0) & (c1 < n)], axis=-1)

    min_i = jnp.where(ext, e, c0)
    max_i = c1
    wlo, wup = [], []
    for _ in range(10):
        min_i = jnp.maximum(min_i - 1, 0)
        max_i = jnp.minimum(max_i + 1, n)
        wlo.append(min_i)
        wup.append(max_i)
    return (lo_o, up_o, close_idx, close_valid,
            jnp.stack(wlo, axis=-1), jnp.stack(wup, axis=-1))


_CL_WIN = 5    # max 'others' window extent
_W_WIN = 25    # max widened-window extent (close span + 2*10)


def _cloud_pass(img, shadows, forest_mask, valid):
    """Multi-temporal cloud candidates vs darkest-pixel composites with
    bounded threshold relaxation (reference :1342-1447). One lax.scan
    over dates; neighbor windows are rank-space gathers with validity
    masks, so one compiled program serves every date count and
    validity pattern."""
    rgb = img[..., :3]
    valid3 = valid[:, None, None, None]
    pct25 = masked_quantile_axis0(rgb, ~valid3, 25.0)
    min_rgb, _ = masked_min_axis0(rgb, ~valid3)

    rank, n, pos = _rank_info(valid)
    lo_o, up_o, close_idx, close_valid, wlo, wup = _cloud_bounds(rank, n)
    n_hi = jnp.maximum(n - 1, 0)
    close_slots = pos[jnp.clip(close_idx, 0, n_hi)]        # (T, 3)

    bad_full = (shadows > 0)[..., None] | ~valid3
    rel_o = jnp.arange(_CL_WIN)
    rel_w = jnp.arange(_W_WIN)
    multi = n > 2

    def body(_, x):
        (r, lo, up, cslots, cval, wlo_t, wup_t, rgb_t) = x

        slots_o = pos[jnp.clip(lo + rel_o, 0, n_hi)]
        win_o = jnp.take(rgb, slots_o, axis=0)
        bad_o = jnp.take(bad_full, slots_o, axis=0)
        valid_o = (lo + rel_o) < up
        ri_upper, empty_u = masked_min_t(
            win_o, bad_o | ~valid_o[:, None, None, None])
        ri_upper = jnp.where(empty_u, pct25, ri_upper)

        rgb_c = jnp.take(rgb, cslots, axis=0)
        bad_c = jnp.take(bad_full, cslots, axis=0) \
            | ~cval[:, None, None, None]
        ri_close, empty_c = masked_min_t(rgb_c, bad_c)

        # widen the window until filled (reference 10-iteration
        # expansion :1385-1391); one fixed-size gather covers the
        # widest window, per-step masks select the k-th extent
        offs = wlo_t[9] + rel_w
        slots_w = pos[jnp.clip(offs, 0, n_hi)]
        win_w = jnp.take(rgb, slots_w, axis=0)
        bad_w = jnp.take(bad_full, slots_w, axis=0)
        for k in range(10):
            vmask = ((offs >= wlo_t[k]) & (offs < wup_t[k])
                     & (offs != r))
            ri_new, empty_new = masked_min_t(
                win_w, bad_w | ~vmask[:, None, None, None])
            ri_close = jnp.where(empty_c & ~empty_new, ri_new,
                                 ri_close)
            empty_c = empty_c & empty_new
        ri_close = jnp.where(empty_c, min_rgb, ri_close)

        # degenerate stacks (n <= 2): darkest composite only
        # (reference's static t > 2 guard, :1342)
        ri_close = jnp.where(multi, ri_close, min_rgb)
        ri_upper = jnp.where(multi, ri_upper, min_rgb)

        close_thresh = jnp.minimum(ri_close[..., 0] / 2.0 + 0.005, 0.10)
        close_thresh = jnp.maximum(close_thresh, 0.05)
        close_thresh = jnp.where(forest_mask == 1, close_thresh - 0.02,
                                 close_thresh)
        close_thresh = jnp.maximum(close_thresh, 0.04)

        d_upper = rgb_t - ri_upper
        d_close = rgb_t - ri_close
        clouds_i = ((d_upper[..., 0] > 0.08)
                    & (d_upper[..., 1] > 0.08)
                    & (d_upper[..., 2] > 0.07)).astype(jnp.float32)
        cl_mean = jnp.mean(clouds_i > 0)

        # bounded relaxation of the close threshold: raise the modifier
        # until the "close" mask adds at most 7.5% extra cloud
        def cond(state):
            modifier, close_mean = state
            return (close_mean - cl_mean) > 0.075

        def wbody(state):
            modifier, _ = state
            cc = ((d_close[..., 0] > close_thresh + modifier + 0.01)
                  & (d_close[..., 1] > close_thresh + modifier + 0.01)
                  & (d_close[..., 2] > close_thresh + modifier))
            return modifier + 0.0025, jnp.mean(cc)

        modifier, _ = jax.lax.while_loop(cond, wbody,
                                         (jnp.float32(0.0),
                                          jnp.float32(1.0)))
        modifier = modifier - 0.0025  # final accepted modifier
        clouds_close = ((d_close[..., 0] > close_thresh + modifier + 0.01)
                        & (d_close[..., 1] > close_thresh + modifier + 0.01)
                        & (d_close[..., 2] > close_thresh + modifier)
                        ).astype(jnp.float32)

        brightness = jnp.sum(rgb_t, axis=-1) < 0.75
        clouds_close = clouds_close * brightness
        eroded = erode(clouds_close, 2)
        clouds_close = jnp.where(forest_mask == 0, eroded, clouds_close)
        return None, jnp.maximum(clouds_i, clouds_close)

    _, clouds = jax.lax.scan(
        body, None,
        (rank, lo_o, up_o, close_slots, close_valid, wlo, wup, rgb))
    return clouds * valid[:, None, None]


# -------------------------------------------------------------- parallax

def _gaussian_blur_05(x):
    """scipy gaussian_filter(sigma=0.5, truncate=3) equivalent:
    separable 5-tap kernel, reflect boundary."""
    r = 2
    xs = np.arange(-r, r + 1)
    k = np.exp(-xs ** 2 / (2 * 0.25))
    k = (k / k.sum()).astype(np.float32)
    kj = jnp.asarray(k)

    pad = [(0, 0)] * (x.ndim - 2) + [(r, r), (r, r)]
    xp = jnp.pad(x, pad, mode="symmetric")
    h, w = x.shape[-2], x.shape[-1]
    out = jnp.zeros_like(x)
    for i in range(2 * r + 1):
        out = out + kj[i] * xp[..., i:i + h, r:r + w]
    xp2 = jnp.pad(out, pad, mode="symmetric")
    out2 = jnp.zeros_like(x)
    for i in range(2 * r + 1):
        out2 = out2 + kj[i] * xp2[..., r:r + h, i:i + w]
    return out2


def _box_var(x, size: int = 7):
    """Local variance via box filters with symmetric boundary
    (reference :1177-1196)."""
    mean_sq = mean_filter(x * x, size)
    sq_mean = mean_filter(x, size) ** 2
    return mean_sq - sq_mean


def _downsample2(x):
    h, w = x.shape[-2], x.shape[-1]
    if h % 2 or w % 2:
        pad = [(0, 0)] * (x.ndim - 2) + [(0, h % 2), (0, w % 2)]
        x = jnp.pad(x, pad, mode="edge")
        h, w = x.shape[-2], x.shape[-1]
    x = x.reshape(x.shape[:-2] + (h // 2, 2, w // 2, 2))
    return jnp.mean(x, axis=(-3, -1))


def detect_pfcp(img, dem, urban_mask=None, valid=None):
    """Urban/parallax false-cloud detection, Fmask 4.0 CDI
    (reference :1109-1212). Returns (fcps, pfps) as (T, H, W) floats."""
    t_total, h, w = img.shape[0], img.shape[1], img.shape[2]
    if valid is None:
        valid = jnp.ones(t_total, bool)
    bad3 = ~valid[:, None, None]
    ndwi_med, _ = masked_median_axis0(ndwi(img), bad3)

    pfps, _ = masked_median_axis0(
        ((ndbi(img) > 0)
         & (ndbi(img) > ndvi(img))).astype(jnp.float32), bad3)
    pfps = pfps * (ndwi_med < 0)
    if urban_mask is not None:
        pfps = jnp.where(urban_mask > 0, 1.0, pfps) * \
            dilate(urban_mask, 5, cross=False)
    else:
        pfps = jnp.zeros_like(dem)
    pfps = pfps * ((dem / 90.0) <= 0.10)
    pfps = jnp.broadcast_to(pfps[None], (t_total, h, w))

    b8 = _downsample2(_gaussian_blur_05(img[..., 3]))
    b8a = _downsample2(img[..., 7])
    b7 = _downsample2(img[..., 6])

    r8a = _box_var(b8 / (b8a + EPS), 7)
    r8a7 = _box_var(b7 / (b8a + EPS), 7)
    cdi = (r8a7 - r8a) / (r8a7 + r8a + EPS)
    pfcps = (cdi >= -0.4).astype(jnp.float32)
    pfcps = jnp.repeat(jnp.repeat(pfcps, 2, axis=-2), 2, axis=-1)
    pfcps = pfcps[..., :h, :w]
    pfcps = pfcps * (ndvi(img) < 0.4)

    cdis = dilate(pfcps, 6, cross=False)
    pfps = dilate(pfps, 6, cross=False)
    return pfps * cdis, pfps


# ------------------------------------------------------------ main entry

@partial(jax.jit, static_argnames=("use_urban",))
def identify_clouds_shadows(img, dem, forest_mask=None, urban_mask=None,
                            use_urban: bool = False, valid=None):
    """(T, H, W, 10) datacube -> (clouds∪shadows, fcps) float masks.

    img: reflectance stack. `valid` marks occupied slots of a
    fixed-capacity stack: invalid dates are excluded from every
    temporal reference (neighbor windows run in valid-rank space) and
    report all-cloud, so masker(s2, valid)[valid] equals
    masker(s2[valid]) exactly (tested).
    dem: (H, W) median-filtered DEM (meters).
    """
    t_total = img.shape[0]
    if forest_mask is None:
        forest_mask = jnp.zeros_like(dem)
    if valid is None:
        valid = jnp.ones(t_total, bool)
    valid = valid.astype(bool)
    valid3 = valid[:, None, None]

    water_mask, _ = masked_median_axis0(ndwi(img), ~valid3)
    clm = jnp.where(valid3, hollstein_seed(img), 1.0)

    shadows = _shadow_pass(img, clm, water_mask, dem, valid)
    clouds = _cloud_pass(img, shadows, forest_mask, valid)

    # brightness z-score clouds with recurrence veto (:1458-1481):
    # per-date masked medians over the full image via radix select
    # (replacing 382k-element XLA sorts per date)
    brightness = jnp.sum(img[..., :3], axis=-1)
    t_flat = brightness.reshape(t_total, -1)
    keep_flat = ((clouds == 0) & (shadows == 0)).reshape(t_total, -1)
    med_b, _ = masked_median(t_flat, keep_flat, axis=1)    # (T,)
    ratio = brightness / jnp.maximum(med_b, EPS)[:, None, None]
    ratio = jnp.where((water_mask > 0)[None], 1.0, ratio)
    mean_r, std_r = jax.vmap(masked_mean_std)(ratio, clouds == 0)
    z = (ratio - mean_r[:, None, None]) \
        / jnp.maximum(std_r, EPS)[:, None, None]
    bclouds = (z > 3.5).astype(jnp.float32) * (water_mask < 0)[None]
    bclouds = bclouds * valid3
    recurrence = jnp.sum((bclouds - clouds) > 0, axis=0)
    bclouds = jnp.where(recurrence[None] > 1, 0.0, bclouds)
    clouds = jnp.maximum(clouds, bclouds)

    # whiteness filter (:1484-1492)
    mean_bright = jnp.mean(img[..., :3], axis=-1)
    vis_range = (jnp.max(img[..., :3], axis=-1)
                 - jnp.min(img[..., :3], axis=-1))
    is_fp = (mean_bright < 0.4) & (vis_range / jnp.maximum(mean_bright,
                                                           EPS) > 0.5)
    clouds = clouds * (1.0 - is_fp.astype(jnp.float32))

    # parallax urban false positives (:1498-1511) and NIR/SWIR
    # bright-surface filter (:1516-1527): both gate on the same
    # +-1-date darkest composite — one scan over dates
    fcps, pfcps = detect_pfcp(img, dem,
                              urban_mask if use_urban else None,
                              valid=valid)
    nir_swir = dilate((img[..., 3] / (img[..., 8] + 0.01) < 0.75)
                      .astype(jnp.float32), 3)
    # darkest +-1-valid-date composite per date, vectorized: a (T, 3)
    # rank-space gather instead of the former scan over padded slices
    chan_min = jnp.where(valid3, jnp.min(img[..., :3], axis=3),
                         jnp.inf)                       # (T, H, W)
    rank, n, pos = _rank_info(valid)
    n_hi = jnp.maximum(n - 1, 0)
    lo2 = jnp.maximum(rank - 1, 0)
    hi2 = jnp.minimum(rank + 2, n)
    rel3 = jnp.arange(3)
    k2 = lo2[:, None] + rel3
    slots2 = pos[jnp.clip(k2, 0, n_hi)]                 # (T, 3)
    win2 = chan_min[slots2]                             # (T, 3, H, W)
    inwin2 = (k2 < hi2[:, None])[..., None, None]
    darkest = jnp.min(jnp.where(inwin2, win2, jnp.inf), axis=1)
    isnt_cloud = (mean_bright - darkest) < 0.4
    rm = (fcps > 0) & isnt_cloud
    clouds = jnp.where(rm, 0.0, clouds)
    shadows = jnp.where(rm, 0.0, shadows)
    ns = jnp.where((water_mask < 0)[None], 0.0, nir_swir)
    clouds = jnp.where((ns > 0) & isnt_cloud, 0.0, clouds)

    # water NIR false positives (:1534-1539)
    water_fp = dilate(((water_mask > 0)
                       & (img[..., 8] < 0.11)).astype(jnp.float32), 10)
    clouds = jnp.where(water_fp > 0, 0.0, clouds)

    # 3x3 minority filter (:1542-1544)
    wsum = winsum(clouds, 3)
    clouds = jnp.where(wsum < 5, 0.0, clouds)

    # dark-surface filter (:1546-1551)
    dark = dilate((brightness < 0.21).astype(jnp.float32), 3) \
        * (1.0 - forest_mask)
    clouds = jnp.where(dark > 0, 0.0, clouds)

    # urban vs non-urban size-dependent dilation (:1589-1612) — every
    # op is per-pixel/morphological, so it runs on the full stack
    pfcps_d = dilate(pfcps, 5)
    c = erode(clouds, 1)
    urban = erode(c * pfcps_d, 3)
    non_urban = c * (1.0 - pfcps_d)
    ws = winsum(non_urban, 3)
    large = jnp.where(ws < 6, 0.0, non_urban)
    small = jnp.where(ws >= 6, 0.0, non_urban)
    merged = jnp.maximum(dilate(large, 5), dilate(small, 1))
    dist = capped_edt(merged > 0, 4.0)
    clouds = (dist <= 3.0).astype(jnp.float32) + urban

    # shadow-plausibility pruning (:1617-1626)
    cloud_frac = jnp.mean(clouds, axis=(1, 2))
    shadow_frac = jnp.mean(shadows, axis=(1, 2))
    dil_clouds = dilate(clouds, 50)
    allowed = jnp.logical_or(dil_clouds > 0, (dem >= 30)[None])
    prune1 = (shadow_frac > cloud_frac + 0.3) & (cloud_frac < 0.3)
    prune2 = (cloud_frac < 0.05) \
        & (shadow_frac / jnp.maximum(cloud_frac, EPS) > 3)
    prune = (prune1 | prune2)[:, None, None]
    shadows = jnp.where(prune, shadows * allowed, shadows)

    clouds = jnp.maximum(clouds, shadows)
    fcps = dilate(jnp.maximum(fcps, nir_swir), 2)

    # false-negative shadow recovery via 1/blue z-score (:1638-1648),
    # vectorized over dates (per-date scalar stats via axis reductions)
    inv_blue = 1.0 / jnp.maximum(img[..., 0], EPS)       # (T, H, W)
    keep_k = (clouds == 0).astype(jnp.float32)
    n_k = jnp.maximum(jnp.sum(keep_k, axis=(1, 2)), 1.0)
    mean_i = jnp.sum(inv_blue * keep_k, axis=(1, 2)) / n_k
    var_i = jnp.sum((inv_blue - mean_i[:, None, None]) ** 2 * keep_k,
                    axis=(1, 2)) / n_k
    ref_i = (mean_i + 2.0 * jnp.sqrt(var_i))[:, None, None]
    sh = ((inv_blue > ref_i) & (img[..., 7] < 0.17)).astype(jnp.float32)
    sh = dilate(1.0 - dilate(1.0 - sh, 2), 2)
    sh = jnp.where(water_mask > 0, 0.0, sh)
    cloudy_frac = jnp.mean(clouds, axis=(1, 2))[:, None, None]
    clouds = jnp.where(cloudy_frac < 0.9,
                       jnp.maximum(clouds, sh), clouds)
    clouds = jnp.clip(clouds, 0.0, 1.0)

    # haze flag: bright + flat + non-white images become all-cloud
    # (:1652-1676)
    def _haze_stats(mb_t, vr_t, clouds_t):
        m, s = masked_mean_std(mb_t, clouds_t == 0)
        _, sw = masked_mean_std(vr_t, clouds_t == 0)
        return m, s, sw

    mean_cf_b, std_cf_b, std_cf_w = jax.vmap(_haze_stats)(
        mean_bright, vis_range, clouds)
    # exclude fully-cloudy images from the medians like the reference's
    # list comprehension over mean(clouds) < 1 (invalid slots excluded)
    cf_ok = (jnp.mean(clouds, axis=(1, 2)) < 1.0) & valid
    nan = jnp.float32(jnp.nan)
    hb = mean_cf_b / jnp.maximum(
        jnp.nanmedian(jnp.where(cf_ok, mean_cf_b, nan)), EPS)
    hs = std_cf_b / jnp.maximum(
        jnp.nanmedian(jnp.where(cf_ok, std_cf_b, nan)), EPS)
    hw = std_cf_w / jnp.maximum(
        jnp.nanmedian(jnp.where(cf_ok, std_cf_w, nan)), EPS)
    haze = ((hb >= 1.5) & (hs <= 0.67) & (hw < 1)) \
        | ((hb >= 1.3) & (hs <= 0.5))
    clouds = jnp.where(haze[:, None, None], 1.0, clouds)

    # invalid slots report all-cloud / no-fcp
    clouds = jnp.where(valid3, clouds, 1.0)
    fcps = jnp.where(valid3, fcps, 0.0)
    return clouds, fcps


def snow_filter(img):
    """NDSI-based snow probability (reference :1554-1576, :348-370)."""
    nd = (img[..., 1] - img[..., 8]) / (img[..., 1] + img[..., 8] + EPS)
    prob = jnp.clip((jnp.clip(nd, 0.0, 0.42) - 0.1) / 0.32, 0.0, None)
    prob = jnp.where(nd < 0.10, 0.0, prob)
    prob = jnp.where(img[..., 3] < 0.10, 0.0, prob)
    prob = jnp.where((img[..., 3] > 0.35) & (prob > 0), 1.0, prob)
    prob = jnp.where(img[..., 0] < 0.10, 0.0, prob)
    prob = jnp.where((img[..., 0] > 0.22) & (prob > 0), 1.0, prob)
    prob = jnp.where(img[..., 0] / jnp.maximum(img[..., 2], EPS) < 0.75,
                     0.0, prob)
    return prob
