"""Image (date) selection from cloud-cover fractions.

Host-side scalar logic; the arrays involved are O(number of
acquisitions), so numpy is the right tool — no device round trip.

select_sunny_dates replicates subset_contiguous_sunny_dates
(reference: src/preprocessing/cloud_removal.py:1844-2086): pick up to 2
images/month nearest day 1 and 15 with CC < 0.2 (expanded to 0.4 when
it buys >10% clarity), thin to <=1/month when more than 6 images
(preferring mid-month unless the alternative is >=10% clearer), then
drop the cloudiest >0.4 dates and thin March/September to land at <=9
dates. Returns indices to REMOVE from the stack.
"""
from __future__ import annotations

import numpy as np

MONTH_BEGIN = [-60, 31, 59, 90, 120, 151, 181, 212, 243, 273, 304, 341]
MONTH_END = [31, 59, 90, 120, 151, 181, 212, 243, 273, 304, 341, 410]


def summarize_dates(dates, probs):
    """Monthly date/cloud report + duplicate-date list (reference
    print_dates :1796-1841 equivalent). Returns list of (month_window,
    dates, probs) plus duplicates."""
    out = []
    for x, y in zip(MONTH_BEGIN, MONTH_END):
        idx = np.argwhere((dates >= x) & (dates < y)).flatten()
        if len(idx):
            out.append(((x, y), dates[idx].tolist(),
                        np.asarray(probs)[idx].tolist()))
    uniq, counts = np.unique(dates, return_counts=True)
    dupes = uniq[counts > 1].tolist()
    return out, dupes


def _month_indices(dates, x, y):
    return np.argwhere((dates >= x) & (dates < y)).flatten()


def select_sunny_dates(dates, probs):
    """Indices (into the input arrays) to remove."""
    dates = np.asarray(dates)
    probs = np.asarray(probs)
    indices = list(range(len(dates)))

    # Round 1: best <=2 per month by proximity to day 1 / day 15
    if len(dates) > 6:
        best_two = []
        for x, y in zip(MONTH_BEGIN, MONTH_END):
            idx_m = _month_indices(dates, x, y)
            m_dates = dates[idx_m]
            m_clouds = probs[idx_m]

            if len(m_clouds) > 1:
                leastcc = np.min(m_clouds)
                maxcc_val = np.max(m_clouds)
                if (leastcc < 0.2 and maxcc_val > 0.2
                        and (maxcc_val - leastcc) > 0.10):
                    maxcc = 0.2
                else:
                    maxcc = 0.4
            else:
                maxcc = 0.4

            good = m_dates[m_clouds < maxcc]
            idx_good = idx_m[m_clouds < maxcc]
            ideal = [x, x + 15] if x > 0 else [0, 15]
            if len(good) >= 2:
                first = idx_good[np.argmin(abs(good - ideal[0]))]
                second = idx_good[np.argmin(abs(good - ideal[1]))]
                best_two.extend([first, second])
            elif len(good) == 1:
                best_two.append(idx_good[np.argmin(abs(good - ideal[1]))])
    else:
        best_two = list(np.arange(len(dates)))

    dates_r2 = dates[best_two]

    # Round 2: thin to <=1 per month when >=7 images remain
    if len(dates_r2) >= 7:
        n_to_rm = len(dates_r2) - 7
        monthly = []
        removed = 0
        for x, y in zip(MONTH_BEGIN, MONTH_END):
            idx_m = _month_indices(dates, x, y)
            m_dates_all = dates[idx_m]
            idx_m = [v for i, v in enumerate(idx_m)
                     if m_dates_all[i] in dates_r2]
            if len(idx_m) > 1:
                m_clouds = probs[idx_m]
                subset = True
                if x == -60:
                    feb_mar = _month_indices(dates, 31, 90)
                    subset = len(feb_mar) >= 1
                if x == 334:
                    oct_nov = _month_indices(dates, 273, 334)
                    subset = len(oct_nov) >= 1
                if subset:
                    subset = removed <= n_to_rm
                if subset:
                    if m_clouds[1] >= 0.2 and \
                            (np.min(m_clouds) + 0.10) < m_clouds[1]:
                        best = [idx_m[int(np.argmin(m_clouds))]]
                    else:
                        best = [idx_m[1]]
                else:
                    best = idx_m
                monthly.extend(best)
                removed += 1
            elif len(idx_m) == 1:
                monthly.append(idx_m[0])
    else:
        monthly = best_two

    to_rm = [i for i in indices if i not in monthly]
    dates_r3 = dates[monthly]
    probs_r3 = probs[monthly]

    # Round 3: if still >=10 dates, drop cloudiest >0.4 and thin months
    remove_next = False
    if len(dates_r3) >= 10:
        n_removed = 0
        n_to_remove = len(dates_r3) - 9
        highest = np.argpartition(probs_r3, -n_to_remove)[-n_to_remove:]
        highest = [i for i in highest if probs_r3[i] > 0.4]
        rm_dates = dates_r3[highest]
        idx_rm = np.argwhere(np.isin(dates, rm_dates)).flatten()
        to_rm.extend(idx_rm)
        n_removed += len(idx_rm)

        for x, y in zip(MONTH_BEGIN, MONTH_END):
            idx_m = [i for i in _month_indices(dates, x, y)
                     if i in monthly]
            if (len(idx_m) >= 1 and len(monthly) >= 10
                    and n_removed < n_to_remove):
                if x in (59, 243) or remove_next:
                    if len(idx_m) > 0:
                        if idx_m[0] not in to_rm:
                            to_rm.append(idx_m[0])
                            remove_next = False
                            n_removed += 1
                        else:
                            remove_next = True
                    else:
                        remove_next = not remove_next

    return to_rm
