"""FISTA projected-gradient NNLS vs scipy's Lawson-Hanson reference.

The mosaic-alignment fit is the reference's sklearn
LinearRegression(positive=True, fit_intercept=False) — i.e.
scipy.optimize.nnls — per band (reference
src/preprocessing/cloud_removal.py:553-555). ttc solves the same
problem on device with a fixed-iteration FISTA loop (nnls_gram);
these tests pin it to scipy on the actual problem geometry
(11 features, 10 target bands, heavily weighted samples).
"""
import numpy as np
import pytest

scipy_opt = pytest.importorskip("scipy.optimize")

from ttc.preprocess.gapfill import _nnls_align, nnls_gram


def _rand_problem(seed, n=4000, f=11, c=10, collinear=False):
    rng = np.random.default_rng(seed)
    x = rng.random((n, f)).astype(np.float32) * 0.4
    if collinear:
        x[:, 5] = 0.7 * x[:, 2] + 0.3 * x[:, 3]  # rank-stressed
    true = np.abs(rng.standard_normal((f, c))).astype(np.float32)
    true[rng.random((f, c)) < 0.4] = 0.0          # active constraints
    y = x @ true + 0.01 * rng.standard_normal((n, c)).astype(np.float32)
    return x.astype(np.float64), y.astype(np.float64)


@pytest.mark.parametrize("seed,collinear", [(0, False), (1, False),
                                            (2, True)])
def test_nnls_gram_matches_scipy(seed, collinear):
    x, y = _rand_problem(seed, collinear=collinear)
    xtx, xty = x.T @ x, x.T @ y
    ours = np.asarray(nnls_gram(xtx.astype(np.float32),
                                xty.astype(np.float32)))
    for band in range(y.shape[1]):
        ref, _ = scipy_opt.nnls(xtx, xty[:, band])
        # compare in prediction space (coef space can be degenerate
        # when features are collinear)
        pred_ours = x @ ours[:, band]
        pred_ref = x @ ref
        assert np.allclose(pred_ours, pred_ref, atol=2e-3), (
            band, np.abs(pred_ours - pred_ref).max())
        assert ours[:, band].min() >= 0.0


def test_nnls_align_weighted():
    """Sample weights (stratification mass) fold into the Gram system
    identically to duplicating rows."""
    rng = np.random.default_rng(3)
    x, y = _rand_problem(3, n=1000)
    w = rng.integers(0, 4, size=1000).astype(np.float64)  # 0..3 copies
    ours = np.asarray(_nnls_align(x.astype(np.float32),
                                  y.astype(np.float32),
                                  w.astype(np.float32)))
    # scipy on the row-duplicated problem
    reps = np.repeat(np.arange(1000), w.astype(int))
    xd, yd = x[reps], y[reps]
    for band in range(3):
        ref, _ = scipy_opt.nnls(xd.T @ xd, xd.T @ yd[:, band])
        pred_ours = x @ ours[:, band]
        pred_ref = x @ ref
        assert np.allclose(pred_ours, pred_ref, atol=3e-3)


def test_nnls_zero_mask_is_finite():
    """An all-masked co-clear set (degenerate tile) must not NaN."""
    x = np.zeros((100, 11), np.float32)
    y = np.zeros((100, 10), np.float32)
    m = np.zeros((100,), np.float32)
    out = np.asarray(_nnls_align(x, y, m))
    assert np.all(np.isfinite(out))
