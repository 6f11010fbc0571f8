"""Device-resident change candidates: bit-parity vs the host stage.

The device candidate program (ttc.change.device) must reproduce the
host numpy candidate stage of detect_change exactly — windowed anomaly
counts, per-year slice sums, the cross-structure open and 3x3 median —
so detect_change(candidates=...) is a pure acceleration, not an
approximation (reference being replicated: src/change/change.py:
191-241, 310-423).
"""
import numpy as np
import pytest

from ttc.change.device import candidates_device
from ttc.change.pipeline import (
    START_YEAR,
    detect_change,
    identify_gain_in_year,
    identify_loss_in_year,
    precompute_events,
)


def _fixture(rng, n_years=8, t=48, hw=64):
    dates = np.sort(rng.integers(0, n_years * 365, t))
    # correlated exceedance maps with planted anomaly runs
    base = rng.random((t, hw, hw))
    f5 = (base > 0.05).astype(np.int16)
    f10 = (base > 0.10).astype(np.int16)
    f25 = (base > 0.25).astype(np.int16)
    f2 = (base > 0.025).astype(np.int16)
    # plant a sustained low run (loss-like) and a recovery (gain-like)
    f5[10:20, 5:15, 5:15] = 0
    f10[10:20, 5:15, 5:15] = 0
    f25[10:22, 5:15, 5:15] = 0
    f2[12:18, 8:12, 8:12] = 0
    f10[25:40, 5:15, 5:15] = 1
    fs = (rng.random((n_years, hw, hw)) * 100).astype(np.float32)
    return f5, f10, f25, f2, dates, fs


def test_candidates_bit_parity(rng):
    f5, f10, f25, f2, dates, fs = _fixture(rng)
    n_years = fs.shape[0]
    years = range(2018, START_YEAR + n_years)
    ev = precompute_events(f5, f10, f25, f2)
    gain_h = np.stack([identify_gain_in_year(f5, f10, dates, yr,
                                             events=ev)
                       for yr in years]).astype(np.float32)
    pairs = [identify_loss_in_year(f5, f10, f25, f2, dates, yr,
                                   events=ev) for yr in years]
    loss_h = np.stack([p[0] for p in pairs]).astype(np.float32)
    ndmi_h = np.stack([p[1] for p in pairs]).astype(np.float32)

    gain_d, loss_d, ndmi_d = candidates_device(f5, f10, f25, f2,
                                               dates, n_years)
    np.testing.assert_array_equal(gain_d, gain_h)
    np.testing.assert_array_equal(loss_d, loss_h)
    np.testing.assert_array_equal(ndmi_d, ndmi_h)


def test_detect_change_with_device_candidates(rng):
    """detect_change(candidates=device) == detect_change(host) end to
    end, including every label-based refinement."""
    f5, f10, f25, f2, dates, fs = _fixture(rng, hw=48)
    n_years = fs.shape[0]
    gain_h, loss_h = detect_change(f5, f10, f25, f2, dates, fs)
    cands = candidates_device(f5, f10, f25, f2, dates, n_years)
    gain_d, loss_d = detect_change(None, None, None, None, dates, fs,
                                   candidates=cands)
    np.testing.assert_array_equal(gain_d, gain_h)
    np.testing.assert_array_equal(loss_d, loss_h)


def test_candidates_short_stack(rng):
    """T shorter than the widest window (the windowed-count early
    return) still matches."""
    f5, f10, f25, f2, dates, fs = _fixture(rng, n_years=8, t=4, hw=32)
    n_years = fs.shape[0]
    years = range(2018, START_YEAR + n_years)
    ev = precompute_events(f5, f10, f25, f2)
    gain_h = np.stack([identify_gain_in_year(f5, f10, dates, yr,
                                             events=ev)
                       for yr in years]).astype(np.float32)
    gain_d, _, _ = candidates_device(f5, f10, f25, f2, dates, n_years)
    np.testing.assert_array_equal(gain_d, gain_h)
