"""Device-resident change-detection candidate generation.

The reference computes anomaly-run events and per-year gain/loss
candidate rasters in host numpy (reference: src/change/change.py:
191-241, 310-423) — ~6 s of single-core cumsum/compare chains per
production tile, after reading ~110 MB of boolean percentile stacks
back from the calibration stage.

Here the whole candidate stage runs on device in ONE jitted program,
straight from the calibration outputs (which never leave the device):

  percentile exceedance maps (T, H, W) bool
    -> windowed anomaly counts (cumsum differences along T)
    -> event stacks (threshold compares)
    -> per-year slice sums (a second cumsum + two gathers per year)
    -> candidate open/median morphology
    -> (Y, H, W) uint8 candidate rasters

Only the small candidate rasters (~3 x Y x H x W bytes ~ 8 MB) are
read back; connected-component refinement stays host-side
(ttc.change.pipeline.detect_change). Results are bit-identical to the
host path (tests/test_change_device.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

START_YEAR = 2017


def _windowed_counts(flags, window: int):
    """jnp mirror of ttc.change.events.identify_anomaly_events on a
    boolean stack: count of True in a `window`-length moving window
    along axis 0, with the reference's zero-layer padding rules."""
    t = flags.shape[0]
    counts = flags.astype(jnp.int32)
    if t < window:
        return jnp.zeros_like(counts)
    cs = jnp.cumsum(counts, axis=0)
    cs = jnp.concatenate([jnp.zeros_like(cs[:1]), cs], axis=0)
    sums = cs[window:] - cs[:-window]
    pad_front, pad_back = 1, 1
    if window == 5:
        pad_front, pad_back = 2, 2
    if window == 4:
        pad_front, pad_back = 2, 0
    zero = jnp.zeros_like(sums[:1])
    parts = [zero] * pad_front + [sums] + [zero] * max(pad_back, 0)
    out = jnp.concatenate(parts, axis=0)
    if out.shape[0] >= t:
        return out[:t]
    return jnp.concatenate(
        [out, jnp.zeros((t - out.shape[0],) + out.shape[1:],
                        jnp.int32)], axis=0)


def _year_any(event, a_idx, b_idx):
    """sum(event[a:b], axis=0) > 0 for every year row at once:
    cumsum along T then two plane gathers per year."""
    cs = jnp.cumsum(event.astype(jnp.int32), axis=0)
    cs = jnp.concatenate([jnp.zeros_like(cs[:1]), cs], axis=0)
    return (jnp.take(cs, b_idx, axis=0)
            - jnp.take(cs, a_idx, axis=0)) > 0


def _dilate_cross(x):
    """Binary dilation with scipy's default cross structure and zero
    border (ndimage.binary_dilation border_value=0)."""
    p = jnp.pad(x, ((0, 0), (1, 1), (1, 1)))
    return (p[:, 1:-1, 1:-1] | p[:, :-2, 1:-1] | p[:, 2:, 1:-1]
            | p[:, 1:-1, :-2] | p[:, 1:-1, 2:])


def _median3(x):
    """ndimage.median_filter(binary, 3) == 3x3 majority (>=5 of 9),
    with scipy's default 'reflect' border (jnp 'symmetric')."""
    p = jnp.pad(x.astype(jnp.int32), ((0, 0), (1, 1), (1, 1)),
                mode="symmetric")
    s = sum(p[:, i:i + x.shape[1], j:j + x.shape[2]]
            for i in range(3) for j in range(3))
    return s >= 5


@jax.jit
def _candidates(f5, f10, f25, f2, g_idx, l_idx, first_year_row):
    """The fused candidate program. f*: (T, H, W) bool exceedance maps
    (True = NDMI above the 5/10/25/2.5% stable-pixel threshold).
    g_idx: (5, Y) int32 gain slice bounds [i_p3, i_cur, i_next,
    i_next_end, i_next2]; l_idx: (4, Y) loss bounds [i_prior,
    i_prior_mid, i_next, i_next_mid]; first_year_row: (Y,) bool mask
    selecting the 2018 row (which uses the eq3/eq5 event variants,
    reference change.py:322-330)."""
    neg5_2 = _windowed_counts(~f5, 2)
    neg5_3 = _windowed_counts(~f5, 3)
    neg5_5 = _windowed_counts(~f5, 5)
    pos10_5 = _windowed_counts(f10, 5)
    neg10_5 = _windowed_counts(~f10, 5)
    pos25_4 = _windowed_counts(f25, 4)
    pos25_5 = _windowed_counts(f25, 5)
    neg2_5 = _windowed_counts(~f2, 5)

    fy = first_year_row[:, None, None]
    # gain (reference change.py:310-349)
    neg_prior_ge2 = _year_any(neg5_3 >= 2, g_idx[0], g_idx[2])
    neg_prior_eq3 = _year_any(neg5_3 == 3, g_idx[0], g_idx[2])
    pos_ge4 = _year_any(pos10_5 >= 4, g_idx[1], g_idx[4])
    pos_eq5 = _year_any(pos10_5 == 5, g_idx[1], g_idx[4])
    neg_after = _year_any(neg5_2 == 2, g_idx[2], g_idx[3])
    negative_prior = jnp.where(fy, neg_prior_eq3, neg_prior_ge2)
    positive_after = jnp.where(fy, pos_eq5, pos_ge4)
    cand = negative_prior & ~neg_after & positive_after
    # open with the cross structure: 1 - dilate(1 - x), then dilate
    gain = _dilate_cross(~_dilate_cross(~cand))

    # loss (reference change.py:351-423)
    positive_prior = _year_any(pos25_4 >= 3, l_idx[0], l_idx[2])
    positive_prior_high = _year_any(pos25_5 == 5, l_idx[0], l_idx[2])
    negative_5 = _year_any(neg5_5 >= 3, l_idx[0], l_idx[3])
    negative_10 = _year_any(neg10_5 >= 4, l_idx[0], l_idx[3])
    negative_2 = _year_any((neg2_5 >= 3) | (neg5_5 >= 5),
                           l_idx[1], l_idx[3])
    loss = _median3(positive_prior & (negative_5 | negative_10))
    ndmiloss = _median3(positive_prior_high & negative_2)
    return (gain.astype(jnp.uint8), loss.astype(jnp.uint8),
            ndmiloss.astype(jnp.uint8))


def _imgs_before(dates, offset_years: float) -> int:
    return int(np.sum(np.asarray(dates) <= offset_years * 365))


def candidate_indices(dates, n_years: int):
    """Host-side slice-bound bundle for the jitted candidate program.
    Years 2018 .. START_YEAR + n_years - 1, matching
    pipeline.identify_gain_in_year / identify_loss_in_year."""
    g_rows, l_rows, first = [], [], []
    for year in range(START_YEAR + 1, START_YEAR + n_years):
        y = year - START_YEAR
        i_cur = _imgs_before(dates, y)
        i_next = _imgs_before(dates, y + 1)
        g_rows.append((_imgs_before(dates, y - 3), i_cur, i_next,
                       _imgs_before(dates, y + 2),
                       _imgs_before(dates, y + 3)))
        l_rows.append((_imgs_before(dates, y - 1),
                       _imgs_before(dates, y - 0.5), i_next,
                       _imgs_before(dates, y + 1.5)))
        first.append(year <= START_YEAR + 1)
    g_idx = np.asarray(g_rows, np.int32).T          # (5, Y)
    l_idx = np.asarray(l_rows, np.int32).T          # (4, Y)
    return g_idx, l_idx, np.asarray(first, bool)


def candidates_device(f5, f10, f25, f2, dates, n_years: int):
    """(T, H, W) exceedance maps (device or host, bool/0-1) ->
    host (gain, loss, ndmiloss) float32 stacks of shape
    (n_years - 1, H, W), bit-identical to the host candidate stage of
    ttc.change.pipeline.detect_change."""
    g_idx, l_idx, first = candidate_indices(dates, n_years)
    gain, loss, ndmiloss = _candidates(
        jnp.asarray(f5).astype(bool), jnp.asarray(f10).astype(bool),
        jnp.asarray(f25).astype(bool), jnp.asarray(f2).astype(bool),
        jnp.asarray(g_idx), jnp.asarray(l_idx), jnp.asarray(first))
    return (np.asarray(gain).astype(np.float32),
            np.asarray(loss).astype(np.float32),
            np.asarray(ndmiloss).astype(np.float32))
