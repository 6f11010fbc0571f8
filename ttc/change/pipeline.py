"""Year-over-year tree cover change detection.

Replicates the candidate identification and refinement flow of the
reference change subsystem (reference: src/change/change.py:310-649,
src/change_job.py:62-257):

  per-year NDMI percentile stacks (ttc.change.kde) ->
  anomaly-run candidates (gain: loss-before + sustained-high-after +
  no-loss-after; loss: confident-tree-before + sustained-low-after) ->
  TTC-delta adjustment (adjust_gain/loss_with_ndmi) ->
  stability vetoes (remove_unstable_gain, validate_gain,
  remove_unstable_loss) -> per-pixel year rasters.

Dates are day-of-year offsets from START_YEAR (2017): year k spans
[(k)*365, (k+1)*365).
"""
from __future__ import annotations

import numpy as np
from scipy import ndimage

from ttc.change.events import (
    identify_anomaly_events,
    remove_noise,
    remove_nonoverlapping_events,
    temporal_filter,
)

START_YEAR = 2017


def _imgs_before(dates, offset_years: float) -> int:
    return int(np.sum(np.asarray(dates) <= offset_years * 365))


def precompute_events(kde5, kde10, kde25, kde2) -> dict:
    """The anomaly-run stacks consumed by the per-year candidate
    functions. They do not depend on the year (only the date slicing
    does), so detect_change computes them ONCE instead of per year —
    the reference recomputes every np.convolve stack for all 7 years
    (reference change.py:310-423)."""
    neg5_3 = identify_anomaly_events(kde5, 0, 3)
    pos10_5 = identify_anomaly_events(kde10, 1, 5)
    neg5_5 = identify_anomaly_events(kde5, 0, 5)
    return {
        "g_neg_after": identify_anomaly_events(kde5, 0, 2) == 2,
        "g_neg_prior_ge2": neg5_3 >= 2,
        "g_neg_prior_eq3": neg5_3 == 3,
        "g_pos_ge4": pos10_5 >= 4,
        "g_pos_eq5": pos10_5 == 5,
        "l_pos": identify_anomaly_events(kde25, 1, 4) >= 3,
        "l_pos5": identify_anomaly_events(kde25, 1, 5) == 5,
        "l_neg10": identify_anomaly_events(kde10, 0, 5) >= 4,
        "l_neg5": neg5_5 >= 3,
        "l_neg2": np.logical_or(
            identify_anomaly_events(kde2, 0, 5) >= 3, neg5_5 >= 5),
    }


def identify_gain_in_year(kde5, kde10, dates, year: int,
                          events: dict | None = None) -> np.ndarray:
    """Candidate gain: loss anomaly in Y-3..Y, sustained positive
    anomaly in Y..Y+2, no loss anomaly in Y+1
    (reference change.py:310-349)."""
    y = year - START_YEAR
    if events is None:
        neg5_3 = identify_anomaly_events(kde5, 0, 3)
        pos10_5 = identify_anomaly_events(kde10, 1, 5)
        events = {"g_neg_after": identify_anomaly_events(kde5, 0,
                                                         2) == 2,
                  "g_neg_prior_ge2": neg5_3 >= 2,
                  "g_neg_prior_eq3": neg5_3 == 3,
                  "g_pos_ge4": pos10_5 >= 4,
                  "g_pos_eq5": pos10_5 == 5}
    neg_after = events["g_neg_after"]
    if year > 2018:
        neg_prior = events["g_neg_prior_ge2"]
        pos = events["g_pos_ge4"]
    else:
        neg_prior = events["g_neg_prior_eq3"]
        pos = events["g_pos_eq5"]

    i_p3 = _imgs_before(dates, y - 3)
    i_cur = _imgs_before(dates, y)
    i_next = _imgs_before(dates, y + 1)
    i_next_end = _imgs_before(dates, y + 2)
    i_next2 = _imgs_before(dates, y + 3)
    if year == 2017:
        i_cur = i_next

    negative_prior = np.sum(neg_prior[i_p3:i_next], axis=0) > 0
    positive_after = np.sum(pos[i_cur:i_next2], axis=0) > 0
    negative_after = np.sum(neg_after[i_next:i_next_end], axis=0) > 0

    cand = negative_prior * (1 - negative_after) * positive_after
    # open with the cross structure (erode 1, dilate 1)
    cand = ndimage.binary_dilation(
        1 - ndimage.binary_dilation(1 - cand)).astype(np.uint8)
    return cand


def identify_loss_in_year(kde5, kde10, kde25, kde2, dates,
                          year: int, events: dict | None = None):
    """Candidate loss (reference change.py:351-423). Returns
    (candidate_loss, candidate_loss_ndmi)."""
    y = year - START_YEAR
    if events is None:
        neg5_5 = identify_anomaly_events(kde5, 0, 5)
        events = {"l_pos": identify_anomaly_events(kde25, 1, 4) >= 3,
                  "l_pos5": identify_anomaly_events(kde25, 1, 5) == 5,
                  "l_neg10": identify_anomaly_events(kde10, 0,
                                                    5) >= 4,
                  "l_neg5": neg5_5 >= 3,
                  "l_neg2": np.logical_or(
                      identify_anomaly_events(kde2, 0, 5) >= 3,
                      neg5_5 >= 5)}
    pos = events["l_pos"]
    pos5 = events["l_pos5"]
    neg10 = events["l_neg10"]
    neg5 = events["l_neg5"]
    neg2 = events["l_neg2"]

    i_prior = _imgs_before(dates, y - 1)
    i_prior_mid = _imgs_before(dates, y - 0.5)
    i_next = _imgs_before(dates, y + 1)
    i_next_mid = _imgs_before(dates, y + 1.5)

    positive_prior = np.sum(pos[i_prior:i_next], axis=0) > 0
    positive_prior_high = np.sum(pos5[i_prior:i_next], axis=0) > 0
    negative_5 = np.sum(neg5[i_prior:i_next_mid], axis=0) > 0
    negative_10 = np.sum(neg10[i_prior:i_next_mid], axis=0) > 0
    negative_2 = np.sum(neg2[i_prior_mid:i_next_mid], axis=0) > 0

    cand = positive_prior * np.logical_or(negative_5, negative_10)
    cand = ndimage.median_filter(cand.astype(np.uint8), 3)
    cand_ndmi = positive_prior_high * negative_2
    cand_ndmi = ndimage.median_filter(cand_ndmi.astype(np.uint8), 3)
    return cand, cand_ndmi


def assign_loss_year(loss, fs):
    """Re-assign loss year to the largest TTC drop
    (reference change.py:138-150)."""
    max_drop_year = np.argmin(np.diff(fs, axis=0), axis=0) + 1
    out = loss.copy()
    for i in range(loss.shape[0]):
        out[i] = (loss[i] > 0) * max_drop_year
    return out


def adjust_gain_with_ndmi(idx, ff, gain):
    """TTC-delta gain candidate for mid years
    (reference change.py:426-452)."""
    prior = int(np.clip(idx - 1, 0, idx - 2)) if idx >= 2 else 0
    if prior != 0:
        cand = (((ff[idx] - np.min(ff[prior:idx], axis=0)) > 50)
                * (ff[idx] > 50) * (ff[idx + 1] > 40)
                * ((ff[idx + 1] - ff[idx]) > -50))
    else:
        cand = (((ff[idx] - np.mean(ff[prior:idx], axis=0)) > 50)
                * (ff[idx] > 50) * (ff[idx + 1] > 40)
                * ((ff[idx + 1] - ff[idx]) > -50))
    cand = cand * (ff[idx + 1] <= 100) * (ff[idx] <= 100)
    anomaly = np.max(gain[idx - 1:idx], axis=0)
    return remove_nonoverlapping_events(cand.astype(np.uint8),
                                        anomaly, 4) * idx


def adjust_loss_with_ndmi(idx, ff, loss, ndmiloss, adjustment):
    """TTC-delta loss candidate (reference change.py:454-491)."""
    base_change = float(np.clip(50 - adjustment, 40, 80))

    cand = (np.mean(ff[idx - 1:idx + 1], axis=0)
            - ff[idx + 1]) > base_change
    cand = cand * (ff[idx + 1] <= 40)
    prior = np.mean(ff[idx - 1:idx + 1], axis=0)
    cand = cand * (prior >= 60)
    cand = cand.astype(np.uint8)
    if idx <= 3 and idx + 2 < ff.shape[0]:
        unstable = cand * np.logical_or(ff[idx + 2] >= 50, prior <= 60)
        fp = remove_nonoverlapping_events(unstable.astype(np.uint8),
                                          loss[idx], 2)
        fp = ndimage.median_filter(fp, 3)
        cand[unstable > 0] = fp[unstable > 0]
    out = remove_nonoverlapping_events(cand, loss[idx], 4)

    nl = ndmiloss[idx] * np.logical_or(ff[idx] > 80, ff[idx - 1] > 80)
    nl = nl * (np.min(ff[idx:], axis=0) < 70)
    nl = remove_noise(nl.astype(np.uint8), thresh=8)
    return np.logical_or(out, nl) * (idx + 1)


def remove_unstable_gain(loss, gain, fs):
    """Remove T->NT->T gain with no detected loss
    (reference change.py:493-504)."""
    gain = gain.copy()
    for i in range(loss.shape[0]):
        if i == 0:
            continue
        prior_trees = (fs[i - 1] > 70) & (fs[i] < 35)
        no_prior_loss = np.sum(loss[:i + 1] > 0, axis=0) == 0
        unstable = (gain[i] > 0) * prior_trees * no_prior_loss
        gain[i] = gain[i] * (1 - unstable)
    return gain


def validate_ard(n_imgs_per_year, ard_means_or_stack, dates=None):
    """Between-year NDMI outlier years (reference change_job.py:62-97).
    Accepts either the NDMI stack (mean computed per year window) or
    precomputed annual means."""
    annual = []
    total = 0
    for n in n_imgs_per_year:
        if n > 0:
            if np.ndim(ard_means_or_stack) > 1:
                annual.append(float(np.mean(
                    ard_means_or_stack[total:total + n])))
            else:
                annual.append(float(ard_means_or_stack[len(annual)]))
            total += n
        else:
            annual.append(np.nan)
    annual = np.array(annual, np.float64)
    nans = np.isnan(annual)
    if nans.any() and (~nans).any():
        annual[nans] = np.interp(np.flatnonzero(nans),
                                 np.flatnonzero(~nans), annual[~nans])
    diffs = np.diff(annual)
    outliers = []
    for i in range(len(diffs)):
        others = np.delete(diffs.copy(), i)
        mean_others = np.mean(np.abs(others))
        if mean_others > 0 and diffs[i] / mean_others >= 3 and i == 0:
            outliers.append(i)
    return outliers


def detect_change(kde5, kde10, kde25, kde2, dates, fs,
                  adjustments=None, candidates=None):
    """Full per-tile change detection: percentile stacks + per-year TTC
    rasters fs (N_years, H, W) -> (gain_year, loss_year) uint8 rasters
    (0 = no event, k = event in START_YEAR + k)
    (reference change.py:507-649 main flow).

    `candidates` (optional): precomputed (gain, loss, ndmiloss)
    float32 candidate stacks of shape (n_years - 1, H, W) — the
    device candidate stage (ttc.change.device.candidates_device,
    bit-identical to the host stage below) lets kde* be None and
    skips ~6 s/tile of host numpy."""
    n_years = fs.shape[0]
    if adjustments is None:
        adjustments = np.zeros(n_years)
    ff = temporal_filter(fs.astype(np.float32))

    years = range(2018, START_YEAR + n_years)
    if candidates is not None:
        gain, loss, ndmiloss = (np.asarray(c, np.float32).copy()
                                for c in candidates)
    else:
        ev = precompute_events(kde5, kde10, kde25, kde2)
        gain = np.stack([identify_gain_in_year(kde5, kde10, dates, yr,
                                               events=ev)
                         for yr in years]).astype(np.float32)
        loss_pairs = [identify_loss_in_year(kde5, kde10, kde25, kde2,
                                            dates, yr, events=ev)
                      for yr in years]
        loss = np.stack([p[0] for p in loss_pairs]).astype(np.float32)
        ndmiloss = np.stack([p[1] for p in loss_pairs]).astype(
            np.float32)

    # end-year candidates (reference :517-533)
    adj_end = float(np.clip(50 - adjustments[-1], 40, 80))
    loss_end = ((np.mean(ff[n_years - 3:n_years - 1], axis=0)
                 - ff[n_years - 1]) >= adj_end) \
        * np.logical_or(ff[n_years - 2] > adj_end,
                        ff[n_years - 3] > adj_end) \
        * (ff[n_years - 1] < 30)
    ndmi_end = (np.min(ff[n_years - 3:n_years - 1], axis=0) > 60) \
        * ((np.min(ff[n_years - 3:n_years - 1], axis=0)
            - ff[n_years - 1]) >= 20)
    ndmi_e = remove_nonoverlapping_events(ndmi_end.astype(np.uint8),
                                          ndmiloss[-1], 10)
    loss_e = remove_nonoverlapping_events(loss_end.astype(np.uint8),
                                          loss[-1], 4)
    loss_e = remove_noise(np.logical_or(loss_e, ndmi_e).astype(np.uint8),
                          thresh=6)

    # 2018 candidates (reference :536-546)
    gain18 = ((ff[1] - ff[0]) >= 50) * (ff[0] < 30) * (ff[2] > 50)
    gain18 = remove_nonoverlapping_events(gain18.astype(np.uint8),
                                          gain[0], 2)
    gain18 = np.clip(remove_noise(gain18, thresh=10), 0, 1)
    loss18 = remove_nonoverlapping_events(
        (((ff[0] - ff[1]) >= 50) * (ff[0] > 60)
         * (ff[1] < 40)).astype(np.uint8), loss[0], 3)

    gain[0] = 0.0
    for i in range(1, n_years - 2):
        gain[i] = adjust_gain_with_ndmi(i + 1, ff, gain)

    cand_end = ((ff[n_years - 1]
                 - np.min(ff[n_years - 3:n_years - 1], axis=0) >= 50)
                * (ff[n_years - 1] > 50))
    cand_end = cand_end * np.logical_or(ff[n_years - 2] < 30,
                                        ff[n_years - 3] < 30)
    gain[n_years - 2] = remove_nonoverlapping_events(
        cand_end.astype(np.uint8),
        np.max(gain[n_years - 2:n_years - 1], axis=0), 4) * (n_years - 1)

    loss[0] = 0.0
    for i in range(1, n_years - 2):
        loss[i] = adjust_loss_with_ndmi(i, ff, loss, ndmiloss,
                                        adjustments[min(i + 1,
                                                        n_years - 1)])
    loss[-1] = loss_e * (n_years - 1)

    # gain is predicated on a detected loss when the time series shows
    # tree -> no-tree -> tree rotation (reference change_job.py:559-562)
    gain = validate_gain(gain, loss.copy(), fs)

    gain = remove_unstable_gain(loss, gain, fs)
    gain[gain == 0] = 255
    gain = np.min(gain, axis=0)
    gain[gain == 255] = 0
    gain[gain18 > 0] = gain18[gain18 > 0]

    loss[loss == 0] = 255
    loss = np.min(loss, axis=0)
    loss[loss == 255] = 0

    # 2018/2019 disambiguation (reference :590-600)
    d1718 = fs[0] - fs[1]
    d1918 = fs[1] - fs[2]
    is18 = (d1718 > d1918) & (d1718 > 50)
    is19 = (d1918 > d1718) & (d1918 > 50)
    loss[(loss <= 2) & (loss18 > 0) & is18] = 1
    loss[(loss <= 2) & (loss18 > 0) & is19] = 2

    # rule-based cleanup (reference :624-646)
    unstable = np.sum(np.abs(np.diff(fs, axis=0)) > 40, axis=0) > 3
    gain = gain * (1 - unstable)
    loss = loss * (1 - unstable)
    loss = loss * np.clip(remove_noise((loss > 0).astype(np.uint8), 5),
                          0, 1)
    gain = gain * np.clip(remove_noise((gain > 0).astype(np.uint8), 10),
                          0, 1)
    return gain.astype(np.uint8), loss.astype(np.uint8)


def validate_gain(gain, potential_loss, fs):
    """Remove gain where tree->no-tree->tree rotation lacks a detected
    loss event (reference change_job.py:100-152)."""
    gain = gain.copy()
    potential_loss = potential_loss.copy()
    for i in range(gain.shape[0]):
        if i != 0:
            cand = (np.min(fs[i - 1:i + 1], axis=0) - fs[i + 1]) > 45
        else:
            cand = (fs[i] - fs[i + 1]) > 45
        cand = cand * (fs[i + 1] <= 35)
        potential_loss[i] = remove_nonoverlapping_events(
            cand.astype(np.uint8), potential_loss[i], 2)

    for i in range(gain.shape[0]):
        early = fs[:i]
        later = fs[i + 2:]
        if early.ndim == 2:
            early = early[None]
        was_trees = np.sum((early >= 70) & (early <= 100), axis=0) > 0
        if early.shape[0] > 1:
            max_diff = np.min(np.diff(early, axis=0), axis=0)
            was_trees = was_trees * (max_diff <= -50)

        if i > 0:
            no_prior_loss = np.sum(potential_loss[:i] > 0, axis=0) == 0
        else:
            no_prior_loss = np.ones_like(potential_loss[0], bool)
        no_later_loss = np.sum(potential_loss[i:] > 0, axis=0) == 0
        was_notrees_after = (np.sum(later < 30, axis=0) > 0) \
            if later.shape[0] else np.zeros_like(was_trees)

        bad_before = was_trees * no_prior_loss
        bad_after = was_notrees_after * no_later_loss \
            if (i + 1) != gain.shape[0] else np.zeros_like(was_trees)
        gain[i][np.logical_or(bad_before > 0, bad_after > 0)] = 0
    return gain


def remove_unstable_loss(year, med, fs, nans, start_year: int = 2017):
    """Flag loss events that revert to trees without a gain event, or
    that sit near no-image areas (reference change_job.py:155-256).

    year: calendar year of the loss layer; med: combined change raster
    where loss year k is encoded as (year - start_year + 200); nans: per-year
    no-image masks (N_years, H, W). Returns (unstable_loss, no_img)."""
    from scipy.ndimage import binary_dilation

    n_years = fs.shape[0]
    yi = year - start_year
    gain = np.logical_or((med >= 150) & (med <= 160),
                         (med >= 101) & (med <= 105))
    ttc_year = fs[yi]
    loss_year = med == (year - start_year + 200)
    end_year = start_year + n_years - 1

    def _dil(mask, it):
        return binary_dilation(mask == 1, iterations=it)

    if year < end_year and year > start_year + 1:
        next_year = np.mean(fs[yi + 1:yi + 3], axis=0)
        unstable = (next_year > 60) * (ttc_year < 40) * loss_year
        no_img = _dil(nans[yi], 15) | _dil(nans[yi - 1], 15) \
            | _dil(nans[min(yi + 1, n_years - 1)], 15)
    elif year == start_year + 1:
        next_year = np.mean(fs[yi + 1:], axis=0)
        unstable = (next_year > 50) * (ttc_year < 50) * loss_year
        no_img = _dil(nans[yi], 15) | _dil(nans[yi - 1], 15) \
            | _dil(nans[min(yi + 1, n_years - 1)], 15)
    else:
        no_img = _dil(nans[yi], 30) | _dil(nans[yi - 1], 30)
        unstable = no_img.copy()

    prior_notree = np.sum(fs[:yi + 1] < 30, axis=0) >= 1
    prior_gain = (np.max(fs[:yi + 1], axis=0)
                  - np.min(fs[:yi + 1], axis=0))
    prior_notree = prior_notree * (gain == 0)
    prior_gain = (prior_gain >= 40) * (gain == 0)
    prior_notree = np.logical_or(prior_notree, prior_gain)
    unstable = np.maximum(unstable, prior_notree)
    return unstable, no_img


def build_change_raster(fs, gain, loss, nans,
                        start_year: int = START_YEAR):
    """Combined change raster: per-pixel median tree cover with gain
    encoded as year+100, loss as year+200, rotation as 150/160, then
    per-year unstable-loss and no-image suppression
    (reference change_job.py:666-697).

    fs:   (N_years, H, W) tree-cover stack (255 = nodata)
    gain: (H, W) uint8 year-coded gain raster (0 = none)
    loss: (H, W) uint8 year-coded loss raster
    nans: (N_years, H, W) bool per-year no-image masks
    """
    from scipy.ndimage import binary_dilation

    fs = fs.astype(np.float32).copy()
    n_years = fs.shape[0]
    base = np.median(fs, axis=0)
    med = base.copy()
    med[gain > 0] = gain[gain > 0] + 100.0
    med[loss > 0] = loss[loss > 0] + 200.0
    rotational = (gain > 0) & (loss > 0)
    med[rotational & (gain > loss)] = 150.0
    med[rotational & (loss > gain)] = 160.0
    fs[np.broadcast_to((base > 100)[None], fs.shape)] = 255.0

    for year in range(start_year, start_year + n_years):
        unstable_loss, noimg = remove_unstable_loss(
            year, med, fs, nans, start_year)
        unstable_loss = unstable_loss.astype(bool).copy()
        unstable_loss[gain > 0] = False
        loss_flag = np.logical_or(unstable_loss, noimg)
        loss_flag = loss_flag * (med == (year - start_year + 200))
        med[loss_flag] = base[loss_flag]

    n_valid_years = np.sum(~nans, axis=0)
    lte2_data = binary_dilation(n_valid_years <= 2, iterations=50)
    is_oob = (med > 110) & (med < 150)
    med[is_oob] = base[is_oob]
    med[lte2_data] = base[lte2_data]
    return med
