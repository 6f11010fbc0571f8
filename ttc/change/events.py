"""Anomaly-event primitives for change detection.

Boolean temporal-run detection as sliding-window sums (convolutions
along the time axis) plus the patch-level filters
(reference: src/change/change.py:168-241). Connected-component labeling
stays host-side (scipy) — it runs once per year on a small raster.
"""
from __future__ import annotations

import numpy as np
from scipy import ndimage


def identify_anomaly_events(inp: np.ndarray, value: int,
                            window: int) -> np.ndarray:
    """Count of `inp == value` in a `window`-length moving window along
    axis 0, padded to input length the way the reference concatenates
    zero layers (reference :191-207)."""
    flags = (inp == value).astype(np.int16)
    t = flags.shape[0]
    if t < window:
        return np.zeros_like(flags)
    # windowed sums via cumulative sums along axis 0 — equal to the
    # reference's per-pixel np.convolve(ones(window), mode="valid")
    # but vectorized (a convolve apply_along_axis loop costs minutes
    # at 618^2 production rasters)
    cs = np.cumsum(flags, axis=0, dtype=np.int32)
    cs = np.concatenate([np.zeros_like(cs[:1]), cs], axis=0)
    sums = (cs[window:] - cs[:-window]).astype(np.int16)
    pad_front = 1
    pad_back = 1
    if window == 5:
        pad_front += 1
        pad_back += 1
    if window == 4:
        pad_front += 1
        pad_back -= 1
    pads = [np.zeros_like(sums[:1])] * pad_front + [sums] \
        + [np.zeros_like(sums[:1])] * max(pad_back, 0)
    out = np.concatenate(pads, axis=0)
    return out[:t] if out.shape[0] >= t else np.concatenate(
        [out, np.zeros((t - out.shape[0],) + out.shape[1:], np.int16)])


def remove_noise(arr: np.ndarray, thresh: int = 15) -> np.ndarray:
    """Remove connected patches smaller than thresh (reference
    :181-188)."""
    labeled, n = ndimage.label(arr)
    sizes = ndimage.sum_labels(np.ones_like(arr), labeled,
                               np.arange(n + 1))
    kill = sizes < thresh
    arr = arr.copy()
    arr[kill[labeled]] = 0
    return arr


def remove_nonoverlapping_events(candidate: np.ndarray,
                                 anomaly: np.ndarray,
                                 thresh: int = 2) -> np.ndarray:
    """Zero candidate patches whose overlap with anomaly is < 1/thresh
    (reference :210-222). Vectorized over labels: per-patch sums via
    ndimage.sum_labels instead of one full-raster mask per patch (the
    reference's per-label loop is quadratic at production label
    counts)."""
    candidate = candidate.copy()
    labels, n = ndimage.label(candidate)
    if n == 0:
        return candidate
    idx = np.arange(1, n + 1)
    overlap = ndimage.sum_labels(anomaly.astype(np.float64), labels,
                                 idx)
    sizes = ndimage.sum_labels(np.ones_like(labels, np.float64),
                               labels, idx)
    kill = overlap < (sizes / thresh)
    candidate[np.take(np.concatenate([[False], kill]), labels)] = 0
    return candidate


def prop_overlapping_events(before: np.ndarray, current: np.ndarray,
                            thresh: float) -> np.ndarray:
    """Propagate patches from `before` into `current` when sufficiently
    overlapped (reference :225-232)."""
    current = current.copy()
    labels, n = ndimage.label(before)
    if n == 0:
        return current
    idx = np.arange(1, n + 1)
    overlap = ndimage.sum_labels(current.astype(np.float64), labels,
                                 idx)
    sizes = ndimage.sum_labels(np.ones_like(labels, np.float64),
                               labels, idx)
    keep = overlap > (sizes / thresh)
    current[np.take(np.concatenate([[False], keep]), labels)] = 1
    return current


def temporal_filter(inp: np.ndarray) -> np.ndarray:
    """Replace single-year positive anomalies with the 3-year median
    (reference :168-178)."""
    out = inp.copy()
    for i in range(1, inp.shape[0] - 1):
        window = inp[i - 1:i + 2]
        ismax = (inp[i] == np.nanmax(window, axis=0)) | np.isnan(inp[i])
        med = np.nanmedian(window, axis=0)
        layer = inp[i].copy()
        layer[ismax] = med[ismax]
        out[i] = layer
    return out


def longest_zero_run(series: np.ndarray) -> int:
    """Longest consecutive run of zeros (reference identify_outliers
    :235-241)."""
    z = series == 0
    if not z.any():
        return 0
    edges = np.diff(np.where(np.concatenate(
        ([z[0]], z[:-1] != z[1:], [True])))[0])[::2]
    return int(edges.max()) if edges.size else 0
