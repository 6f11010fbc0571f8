"""Metrics parity vs the reference tolerant-F1 loop + reseg behavior."""
import numpy as np
import pytest

from tests.reference_harness import load_reference_fns, reference_available
from ttc.infer.reseg import (
    adjust_predictions,
    align_border_histograms,
    blend_strip_into_rasters,
    check_if_artifact,
    resegment_pair,
)
from ttc.models.metrics import (
    avg_surface_distance,
    canopy_error,
    evaluate_predictions,
    hausdorff_distance,
    surface_dice,
    tolerant_f1_counts,
)


@pytest.mark.skipif(not reference_available(), reason="no reference")
@pytest.mark.parametrize("seed", range(6))
def test_tolerant_f1_matches_reference(seed):
    fns = load_reference_fns("src/train/src/losses.py",
                             ["compute_f1_score_at_tolerance"])
    rng = np.random.default_rng(seed)
    true = (rng.random((14, 14)) < 0.3).astype(np.float32)
    pred = (rng.random((14, 14)) < 0.3).astype(np.float32)
    ref_tp, ref_fp, ref_fn = fns["compute_f1_score_at_tolerance"](
        true, pred)
    tp, fp, fn = tolerant_f1_counts(true, pred)
    assert (tp, fp, fn) == (int(ref_tp), int(ref_fp), int(ref_fn))


def test_evaluate_predictions_perfect():
    rng = np.random.default_rng(0)
    trues = (rng.random((4, 14, 14)) < 0.4).astype(np.float32)
    out = evaluate_predictions(trues, trues)
    assert out["f1"] == pytest.approx(1.0)
    assert out["error"] == 0.0


def test_surface_metrics_identical_masks():
    m = np.zeros((20, 20), bool)
    m[5:15, 5:15] = True
    assert hausdorff_distance(m, m) == 0.0
    assert avg_surface_distance(m, m) == 0.0
    assert surface_dice(m, m) == 1.0


def test_surface_metrics_shifted():
    a = np.zeros((30, 30), bool)
    b = np.zeros((30, 30), bool)
    a[5:15, 5:15] = True
    b[7:17, 5:15] = True  # shifted 2 px
    assert hausdorff_distance(a, b) == pytest.approx(2.0)
    assert 0 < avg_surface_distance(a, b) <= 2.0


def test_canopy_error_counts():
    t = np.zeros((1, 14, 14), np.float32)
    p = np.zeros((1, 14, 14), np.float32)
    t[0, 5, 5] = 1
    assert canopy_error(t, p) == 1.0


def test_artifact_detection():
    rng = np.random.default_rng(1)
    base = rng.integers(30, 40, (100, 100)).astype(np.uint8)
    # no seam
    assert not check_if_artifact(base, base)
    # strong seam: neighbor much brighter
    bright = np.clip(base + 40, 0, 100).astype(np.uint8)
    assert check_if_artifact(base, bright)


def test_align_border_histograms_reduces_seam(rng):
    strip = rng.random((3, 40, 40, 10)).astype(np.float32) * 0.2
    strip[:, :, 20:] += 0.15  # step at the seam
    aligned = align_border_histograms(strip)
    seam_before = np.abs(strip[:, :, 20] - strip[:, :, 19]).mean()
    seam_after = np.abs(aligned[:, :, 20] - aligned[:, :, 19]).mean()
    assert seam_after <= seam_before


def test_adjust_predictions_matches_stats(rng):
    preds = rng.random((50, 50)).astype(np.float32) * 0.3
    ref = rng.random((50, 50)).astype(np.float32) * 0.5 + 0.2
    out = adjust_predictions(preds, ref)
    assert abs(np.mean(out) - np.mean(ref)) < 0.05


def test_resegment_pair_repairs_seam(rng):
    h = 100
    left = np.full((h, h), 30, np.uint8)
    right = np.full((h, h), 75, np.uint8)

    def strip_fn():
        return np.full((h, 80), 0.5, np.float32)

    l2, r2, repaired = resegment_pair(left, right, strip_fn,
                                      strip_width=40)
    assert repaired
    seam_before = abs(int(left[:, -1].mean()) - int(right[:, 0].mean()))
    seam_after = abs(int(l2[:, -1].mean()) - int(r2[:, 0].mean()))
    assert seam_after < seam_before
