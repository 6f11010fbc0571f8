"""Evaluation metrics: tolerance-relaxed F1, canopy error, surface
distances.

- tolerant_f1_counts: the reference's 1-px-tolerance TP/FP/FN counting
  (reference: src/train/src/losses.py:244-271), vectorized with a 3x3
  max-pool instead of the per-pixel Python loop.
- evaluate_predictions: threshold sweep + metric aggregation used for
  checkpoint selection (reference: src/train/src/losses.py:277-381).
- surface_distances / hausdorff / avg_surface_distance / surface_dice:
  replacement for the vendored DeepMind surface-distance library
  (reference: src/models/metrics.py), implemented on exact small-grid
  EDTs.
"""
from __future__ import annotations

import numpy as np
from scipy import ndimage


def _maxpool3(x: np.ndarray) -> np.ndarray:
    return ndimage.maximum_filter(x, size=3, mode="constant", cval=0)


def tolerant_f1_counts(true: np.ndarray, pred: np.ndarray,
                       true_thresh: float = 0.5):
    """TP/FP/FN with 1-px tolerance: a true positive needs any predicted
    positive in the 3x3 neighborhood and vice versa.

    Truth is binarized at `true_thresh` canopy fraction — the reference
    tests `true == 1` on its 0/0.3-1.0 label encoding
    (losses.py:259-266); with fractional labels a majority-canopy
    threshold is the equivalent."""
    true = (true >= true_thresh).astype(np.uint8)
    pred = (pred > 0).astype(np.uint8)
    pred_near = _maxpool3(pred)
    true_near = _maxpool3(true)

    tp_t = true * (pred_near > 0)                  # matched trues
    fn = true * (pred_near == 0)
    fp = pred * (true_near == 0)
    # predicted positives whose neighborhood has truth AND are exactly
    # true also count as TP (matches the reference's double-count rule,
    # which only ever sets tp[x,y]=1)
    tp = np.maximum(tp_t, pred * true)
    return int(tp.sum()), int(fp.sum()), int(fn.sum())


def tolerant_f1(trues, preds, threshold: float = 0.4):
    """Batch tolerant F1 at a threshold; trues/preds (N, H, W)."""
    tps = fps = fns = 0
    for t, p in zip(trues, preds):
        tp, fp, fn = tolerant_f1_counts(t, p >= threshold)
        tps += tp
        fps += fp
        fns += fn
    precision = tps / max(tps + fps, 1)
    recall = tps / max(tps + fns, 1)
    f1 = 2 * precision * recall / max(precision + recall, 1e-9)
    return f1, precision, recall


def canopy_error(trues, preds, threshold: float = 0.4):
    """Mean absolute canopy-pixel-count error over the batch interior
    (reference: losses.py:345-353)."""
    errors = []
    for t, p in zip(trues, preds):
        pb = (p >= threshold).astype(np.float32)
        errors.append(abs(t[1:-1].sum() - pb[1:-1].sum()))
    return float(np.mean(errors))


def evaluate_predictions(trues, preds, thresholds=(0.35, 0.40)):
    """Threshold sweep; returns the best (f1, threshold, error,
    precision, recall) like the reference's checkpoint criterion."""
    best = None
    for thresh in thresholds:
        f1, p, r = tolerant_f1(trues, preds, thresh)
        err = canopy_error(trues, preds, thresh)
        if best is None or f1 > best[0]:
            best = (f1, thresh, err, p, r)
    return {"f1": best[0], "threshold": best[1], "error": best[2],
            "precision": best[3], "recall": best[4]}


# ---------------------------------------------------- surface distances

def _surface(mask: np.ndarray) -> np.ndarray:
    """Boundary pixels of a binary mask."""
    mask = mask.astype(bool)
    eroded = ndimage.binary_erosion(mask)
    return mask & ~eroded


def surface_distances(a: np.ndarray, b: np.ndarray):
    """Distances from surface of a to surface of b and vice versa."""
    sa = _surface(a)
    sb = _surface(b)
    if not sa.any() or not sb.any():
        return np.array([np.inf]), np.array([np.inf])
    dist_to_b = ndimage.distance_transform_edt(~sb)
    dist_to_a = ndimage.distance_transform_edt(~sa)
    return dist_to_b[sa], dist_to_a[sb]


def hausdorff_distance(a, b, percentile: float = 100.0) -> float:
    d_ab, d_ba = surface_distances(a, b)
    if np.isinf(d_ab).any() or np.isinf(d_ba).any():
        return float("inf")
    return float(max(np.percentile(d_ab, percentile),
                     np.percentile(d_ba, percentile)))


def avg_surface_distance(a, b) -> float:
    d_ab, d_ba = surface_distances(a, b)
    if np.isinf(d_ab).any() or np.isinf(d_ba).any():
        return float("inf")
    return float((d_ab.mean() + d_ba.mean()) / 2)


def surface_dice(a, b, tolerance: float = 1.0) -> float:
    """Fraction of surface within `tolerance` px of the other surface."""
    d_ab, d_ba = surface_distances(a, b)
    if np.isinf(d_ab).any() or np.isinf(d_ba).any():
        return 0.0
    good = (d_ab <= tolerance).sum() + (d_ba <= tolerance).sum()
    return float(good / (len(d_ab) + len(d_ba)))
