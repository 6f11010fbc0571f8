"""Offline tests of the live-acquisition data screens
(reference: tof_downloading.py:897-910,1006-1019,1055-1088,720-757;
download_and_predict_job.py:425-459)."""
import numpy as np

from ttc.io.acquisition import (
    identify_s1_orbit,
    reconcile_40m,
    reject_nan_quarters,
    remove_noise_clouds,
    s1_fallback_plan,
    screen_data_quality,
)


def test_remove_noise_clouds_clears_isolated_persistent():
    t, hw = 6, 12
    arr = np.zeros((t, hw, hw), np.float32)
    # isolated pixel cloudy in EVERY date -> commission noise, cleared
    arr[:, 5, 5] = 2.0
    # a real 3x3 cloud in one date -> kept (neighbors cloudy)
    arr[2, 8:11, 8:11] = 2.0
    out = remove_noise_clouds(arr)
    assert np.all(out[:, 5, 5] == 0)
    assert np.all(out[2, 8:11, 8:11] == 2.0)


def test_remove_noise_clouds_keeps_transient_isolated():
    # isolated but present in only one date -> not persistent, kept
    arr = np.zeros((4, 10, 10), np.float32)
    arr[1, 4, 4] = 2.0
    out = remove_noise_clouds(arr)
    assert out[1, 4, 4] == 2.0


def test_screen_data_quality_threshold():
    t, hw = 5, 8
    q = np.zeros((t, hw, hw), np.uint8)
    q[1] = 255                       # fully bad
    q[3, :, :2] = 255                # 25% bad -> above 0.2
    q[4, :, :1] = 255                # 12.5% bad -> below 0.2
    bad = screen_data_quality(q)
    assert list(bad) == [1, 3]


def test_reconcile_40m_exact_and_odd_shapes():
    rng = np.random.default_rng(0)
    base = rng.random((2, 16, 16, 2)).astype(np.float32)

    # exact 2x match: plain repeat
    out = reconcile_40m(base, 32, 32)
    np.testing.assert_array_equal(
        out, base.repeat(2, axis=1).repeat(2, axis=2))

    # 2-px excess: center trim
    out = reconcile_40m(base, 30, 30)
    assert out.shape == (2, 30, 30, 2)
    np.testing.assert_array_equal(
        out, base.repeat(2, axis=1).repeat(2, axis=2)[:, 1:-1, 1:-1])

    # 1-px excess: repeat-trim-average path
    out = reconcile_40m(base, 31, 31)
    assert out.shape == (2, 31, 31, 2)

    # smaller than target: nearest-resize up
    out = reconcile_40m(base, 34, 34)
    assert out.shape == (2, 34, 34, 2)


def test_identify_s1_orbit_continent_rules():
    assert identify_s1_orbit(0.0, 25.0) == "ASCENDING"       # Africa
    assert identify_s1_orbit(-20.0, 135.0) == "ASCENDING"    # Oceania
    assert identify_s1_orbit(-3.0, -60.0) == "ASCENDING"     # Amazon
    assert identify_s1_orbit(-15.0, -60.0) == "DESCENDING"   # S. Brazil
    assert identify_s1_orbit(10.0, 100.0) == "DESCENDING"    # SE Asia
    assert identify_s1_orbit(28.0, 80.0) == "ASCENDING"      # N. India
    assert identify_s1_orbit(20.0, -100.0) == "DESCENDING"   # Mexico


def test_s1_fallback_plan_order():
    plan = list(s1_fallback_plan(2023, "ASCENDING"))
    assert plan[0] == (2023, "ASCENDING")
    assert plan[1] == (2023, "DESCENDING")
    assert plan[2] == (2023, "ALL")
    assert plan[3] == (2022, "ASCENDING")
    years = [p[0] for p in plan[::3]]
    assert years == [2023, 2022, 2021, 2020, 2019, 2024, 2025]


def test_reject_nan_quarters():
    q = np.ones((4, 6, 6, 2), np.float32) * 0.1
    q[1] = np.nan
    q[2] = 0.0
    valid = reject_nan_quarters(q)
    assert list(valid) == [True, False, False, True]


def test_request_budget_matches_reference_formula():
    """PU ~= (4/3) * T * (H*W/512^2) (reference
    tof_downloading.py:691-699)."""
    from ttc.io.acquisition import RequestBudget

    b = RequestBudget()
    pu = b.charge(12, 512, 512, "s2")
    assert abs(pu - 16.0) < 1e-9
    b.charge(1, 256, 256, "dem")
    assert abs(b.total_pu - (16.0 + 4 / 3 / 4)) < 1e-9
    assert b.n_requests == 2


def test_with_retries_backoff_then_success():
    from ttc.io.acquisition import with_retries

    calls = {"n": 0}
    waits = []

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise IOError("transient")
        return 42

    assert with_retries(flaky, max_attempts=4, base_wait=10,
                        sleep=waits.append) == 42
    assert calls["n"] == 3
    assert waits == [10, 20]  # exponential backoff


def test_with_retries_exhausts_and_raises():
    import pytest

    from ttc.io.acquisition import with_retries

    waits = []

    def always_fails():
        raise IOError("down")

    with pytest.raises(IOError):
        with_retries(always_fails, max_attempts=3, base_wait=1,
                     sleep=waits.append)
    assert waits == [1, 2]
