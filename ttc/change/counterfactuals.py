"""Slope-stratified reference counterfactual thresholds.

Port of calc_reference_change / calc_tree_change /
calc_threshold_for_notree (reference: src/change/change.py:653-769):
empirical NDMI-percentile change thresholds computed from stable
no-tree (or stable tree) pixels binned by their baseline moving-average
level, within a slope stratum — the "how much change is normal here"
baseline that gain/loss candidates must exceed.
"""
from __future__ import annotations

import math

import numpy as np


def round_up(x, a):
    return math.ceil(x / a) * a


def round_down(x, a):
    return math.floor(x / a) * a


def calc_reference_change(movingavg, slopemin, slopemax, notree, dem):
    """Per-baseline-bin counterfactual NDMI ceilings over no-tree pixels
    (reference :661-720). movingavg: (T, H, W) percentile stack in
    [0, 1]; dem: slope degrees."""
    counterfactuals = []
    lowest_change = 0.15
    previous_change = 0.15
    for i in range(0, 60, 5):
        baseline = i / 100
        base_map = np.mean(movingavg[:6], axis=0)
        sel = notree & (base_map >= baseline) \
            & (base_map < baseline + 0.05)
        if np.mean(dem >= slopemin) > 0.05:
            sel = sel & (dem >= slopemin) & (dem <= slopemax)
        npx = np.sum(sel)
        if npx > 500:
            counterfactual = np.percentile(movingavg[6:, sel], 95)
            change = counterfactual - baseline
        else:
            change = previous_change + 0.01
            counterfactual = baseline + change

        change = np.clip(change, 0.15, 0.4)
        lowest_change += 0.01
        lowest_change = np.maximum(lowest_change, change)
        change = np.maximum(lowest_change, change)
        if change > previous_change + 0.01:
            change = previous_change + 0.01
        counterfactuals.append(baseline + change)
        previous_change = change
    return counterfactuals


def calc_tree_change(movingavg, pct, stable, dem):
    """Per-baseline-bin expected NDMI floors for stable trees
    (reference :745-769 — the later of the two definitions, which
    shadows the earlier one)."""
    counterfactuals = []
    t = movingavg.shape[0]
    edges = 6 if t > 30 else (4 if t > 20 else 2)
    for i in range(20, 80, 5):
        baseline = i / 100
        high = np.percentile(movingavg[edges:-edges], 90, axis=0)
        locs = stable & (high >= baseline) & (high < baseline + 0.05)
        high_v = high[locs]
        low_v = np.percentile(movingavg[edges:-edges, locs], 10, axis=0)
        refrange = high_v - low_v
        change = np.mean(refrange) + 2 * np.std(refrange)
        if refrange.size:
            change = np.minimum(change, np.percentile(refrange, 90))
        else:
            change = np.minimum(change, 1.0)
        counterfactuals.append(baseline - change)
    return counterfactuals


def calc_threshold_for_notree(maxval, cfs_trees):
    """Pick the tree-change threshold for a pixel's max NDMI level
    (reference :739-743)."""
    maxval = round_down(maxval, 0.05)
    maxval = np.clip(maxval, 0.2, 0.75)
    return cfs_trees[int(maxval // 0.05) - 3]


def check_for_gain_subtle(ma):
    """Subtle-gain detector on one pixel's NDMI-percentile moving
    average (reference :777-796): a sustained near-zero run (2 at 2.5%
    or 3 at 5%) with no recurrence for ~20 images, no tree history
    before, and >=10 tree-level images after."""
    gain_events = []
    ma = np.asarray(ma)
    for thresh, run in ((0.025, 2), (0.05, 3)):
        for i in np.argwhere(ma < thresh).flatten():
            if i < (ma.shape[0] - 5) and i >= 3:
                if np.sum(ma[i:i + run] <= thresh) == run:
                    if np.sum(ma[i + 2:i + 22] < thresh) == 0:
                        previous_tree = np.sum(ma[:i] > 0.10) >= 2
                        future_tree = np.sum(ma[i:] > 0.10) >= 10
                        if not previous_tree and future_tree:
                            gain_events.append(int(i))
    return gain_events


def min_filter1d(a, w: int = 3):
    from scipy.ndimage import minimum_filter1d

    return minimum_filter1d(a, w)


def check_for_gain_large(ma, deforested, reference, counterfactual,
                         cfs_trees, cfs_trees10=None, modifier=0.0):
    """Large-gain detector on one pixel's moving average
    (reference :799-978): find a stable low baseline whose future
    minimum-filtered trajectory exceeds the slope-stratified
    counterfactual change, vetoing cyclical NDMI and post-gain loss.

    Returns (gain_event_indices, final_reference, gain_date).
    """
    ma = np.asarray(ma, np.float32)
    t = ma.shape[0]
    minimum3 = min_filter1d(ma, 3)
    gain_events = []
    gain_date = 0

    if not deforested:
        baseline = round_down(float(np.mean(ma[:3])), 0.05)
        baseline = float(np.clip(baseline, 0.0, 0.40))
        reference = counterfactual[int(baseline // 0.05)]
    else:
        change = float(np.clip(reference - 0.05, 0.15, 0.35))

    for i in range(t):
        if not (6 <= i < t - 6):
            continue
        n_lookback = (3 if (i - 3) > 0 else i) if deforested else i
        baseline = float(np.median(ma[i - n_lookback:i]))
        if not (baseline <= 0.5 or deforested):
            continue
        baseline = float(np.clip(round_down(baseline, 0.05), 0.0, 0.60))
        reference = counterfactual[int(baseline // 0.05)]
        change = reference - baseline

        endline = minimum3[i + 1:t]
        lastdate_gain = False
        if np.argmax(endline - baseline) >= (endline.shape[0] - 2):
            if baseline < 0.25:
                endline = np.array(ma[-1])
                change = reference - baseline
                lastdate_gain = True

        if not ((np.max(endline) - baseline) > (change + modifier)
                and np.max(endline) > (reference + modifier)):
            continue

        if lastdate_gain:
            beforeidx = max(i, 10)
            max_before = np.max(ma[:beforeidx])
            max_after = np.max(ma[-6:])
            no_cyclical = max_after > (max_before * 1.2 + modifier)
            gain_date = t
            if no_cyclical or deforested:
                gain_events.append(i)
            continue

        hits = np.argwhere((endline >= reference)
                           & ((endline - baseline) > change)).flatten()
        gain_date = int(hits[0]) + i
        imgs_after = ma[gain_date:gain_date + 8]
        if gain_date < (t - 6):
            after_hits = np.argwhere(
                imgs_after > np.percentile(imgs_after, 75)).flatten()
            gain_date_after = (int(after_hits[0]) + gain_date
                               if after_hits.size else gain_date)
        else:
            gain_date_after = gain_date

        beforei = int(np.clip(gain_date - 6, 3, t))
        max_before = np.percentile(ma[:beforei], 90)
        max_after = np.percentile(ma[gain_date:], 90)
        no_cyclical = (max_after - max_before) > (0.05 + modifier)
        no_cyclical = bool(no_cyclical or deforested)

        min_next_6 = np.percentile(ma[gain_date:gain_date + 6], 25)
        min_next_6 = max(min_next_6, np.percentile(
            ma[gain_date_after:gain_date_after + 6], 25))
        reference_min = max(ma[gain_date] * 0.67, ma[i])
        no_loss_after = bool(min_next_6 > reference_min or deforested)

        if no_cyclical and no_loss_after:
            gain_events.append(i)

    final_ref = np.around(reference + modifier, 2)
    if gain_events:
        if len(gain_events) > 3 or max(gain_events) > (t - 3):
            return gain_events, final_ref, gain_date
        if len(gain_events) >= 2 and deforested:
            return gain_events, final_ref, gain_date
        return [], final_ref, 0
    return [], final_ref, 0


def moving_average(a, n: int = 3):
    """Trailing moving average, output length len(a) - n + 1
    (reference :89-94)."""
    ret = np.cumsum(np.asarray(a), dtype=float)
    ret[n:] = ret[n:] - ret[:-n]
    return ret[n - 1:] / n


def calc_max_tc_decrease(mean_treecover):
    """Forward-looking maximum tree-cover decrease (reference
    :981-998)."""
    _max = 0.0
    _min = 100.0
    maxidx = 0
    minidx = 0
    maxdiff = 0.0
    for i in range(mean_treecover.shape[0]):
        if mean_treecover[i] <= _min:
            minidx = i
            _min = mean_treecover[i]
            maxdiff = _min - _max
        if mean_treecover[i] >= _max:
            if maxidx <= minidx:
                _max = mean_treecover[i]
                maxidx = i
    return maxdiff


def filter_gain_px(gain2, loss2, percentiles, fs, cfs_flat, cfs_hill,
                   cfs_steep, cfs_trees, cfs_trees10, notree, dem,
                   dates, n_imgs_per_year, modifier: float = 0.0):
    """Patch-level gain filtering (reference :1001-1225): per connected
    gain patch, run the large/subtle gain detectors on the patch-mean
    NDMI-percentile series with slope-stratified counterfactuals and
    treecover-dip modifiers; deforested patches split into deforested /
    non-deforested halves.

    Returns (accepted_patch_ids, patch_labels, additional_gain,
    gain_dates)."""
    from scipy import ndimage
    from scipy.ndimage import binary_dilation

    from ttc.change.events import remove_noise

    gain2 = remove_noise(np.asarray(gain2).astype(np.uint8), 8)
    labels, n_labels = ndimage.label(gain2)

    if notree.any():
        reference = np.percentile(percentiles[:, notree], 90)
    else:
        reference = 0.2
    reference = float(np.clip(reference, 0.20, 0.40))

    loss_dilated = binary_dilation(np.copy(loss2),
                                   ndimage.generate_binary_structure(2, 1),
                                   3)
    additional_gain = np.zeros_like(labels, dtype=np.int32)
    year = 0
    gainpx = []
    gaindates = []

    for idx in range(1, n_labels):
        patch = labels == idx
        n_px = int(np.sum(patch))
        if n_px == 0:
            continue
        means = np.mean(percentiles[:, patch], axis=1)
        deforested = np.mean(loss_dilated[patch] > 0) > 0.1
        mean_slope = np.mean(dem[patch])
        cfs = cfs_flat if mean_slope < 10 else cfs_hill
        if mean_slope >= 20:
            cfs = cfs_steep

        if deforested and n_px > 125:
            d_area = patch & (loss2 > 0)
            nd_area = patch & (loss2 == 0)
            mean_tc = np.around(np.mean(fs[:, d_area], axis=1), 1)
            d_ma = moving_average(np.mean(percentiles[:, d_area],
                                          axis=1), n=5)
            nd_ma = moving_average(np.mean(percentiles[:, nd_area],
                                           axis=1), n=5) \
                if nd_area.any() else np.array([np.nan])

            d_gain = []
            if not np.isnan(d_ma).any():
                d_gain, _, _ = check_for_gain_large(
                    d_ma, True, reference, cfs, cfs_trees, cfs_trees10,
                    modifier)
            nd_gain = []
            if not np.isnan(nd_ma).any():
                max_dec = np.around(calc_max_tc_decrease(mean_tc), 1)
                dec_mod = 0.1 if max_dec < -30 else (
                    0.05 if max_dec < -20 else 0.0)
                nd_gain, _, _ = check_for_gain_large(
                    nd_ma, False, reference, cfs, cfs_trees,
                    cfs_trees10, modifier + dec_mod)
            if nd_gain:
                additional_gain[patch & (loss2 == 0)] = \
                    gain2[patch & (loss2 == 0)]
            if d_gain:
                additional_gain[patch & (loss2 > 0)] = \
                    gain2[patch & (loss2 > 0)]
            continue

        # non-deforested patch: process as-is
        ma = moving_average(means, n=5)
        mean_tc = np.around(np.mean(fs[:, patch], axis=1), 1)
        max_dec = np.around(calc_max_tc_decrease(mean_tc), 1)
        if max_dec < -30:
            dec_mod = float(np.clip(abs((max_dec + 30) / 100) + 0.1,
                                    0.1, 0.2))
        elif max_dec < -20:
            dec_mod = float(np.clip(abs((max_dec + 20) / 200) + 0.05,
                                    0.05, 0.1))
        else:
            dec_mod = 0.0
        large_gain, gval, gdate = check_for_gain_large(
            ma, deforested, reference, cfs, cfs_trees, cfs_trees10,
            modifier + dec_mod)
        subtle = check_for_gain_subtle(ma) if mean_slope < 10 else []

        if not large_gain and not subtle:
            # retry per candidate year sub-patch
            for year in np.unique(gain2[patch]):
                if np.sum(patch & (gain2 == year)) > 50:
                    yl = remove_noise(
                        (patch & (gain2 == year)).astype(np.uint8), 8)
                    yl, n_year = ndimage.label(yl)
                    for i in range(1, n_year + 1):
                        sub = yl == i
                        sub_ma = moving_average(
                            np.mean(percentiles[:, sub], axis=1), n=5)
                        sub_def = np.mean(loss_dilated[sub] > 0) > 0.25
                        sub_gain, _, _ = check_for_gain_large(
                            sub_ma, sub_def, reference, cfs, cfs_trees,
                            cfs_trees10, modifier + dec_mod)
                        if np.sum(sub) > 10 and sub_gain:
                            additional_gain[sub] = year
            continue

        n_gain_events = len(large_gain)
        if n_px > 100 and year == 5 and not deforested:
            gain_increase = 100.0  # computed for the 2022 veto below
            if year > 2:
                prev = np.max(fs[:int(year) - 1][:, patch], axis=0)
                prev = np.around(np.mean(prev), 1)
            else:
                prev = 0.0
            gain_increase = np.around(mean_tc[int(year)] - prev, 1)
            if abs(max_dec) > 25 and gain_increase < 40:
                large_gain = []
                n_gain_events = 0
        if n_px < 25:
            if n_gain_events > 5:
                gainpx.append(idx)
                gaindates.append(gdate)
        elif n_gain_events > 0:
            gainpx.append(idx)
            gaindates.append(gdate)
    return gainpx, labels, additional_gain, gaindates
