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
