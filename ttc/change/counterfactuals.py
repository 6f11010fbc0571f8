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
