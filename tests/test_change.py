"""Change detection: KDE calibration parity vs scipy, event primitives
parity vs the reference, and an end-to-end planted gain/loss scenario."""
import numpy as np
import pytest
from scipy.stats import gaussian_kde
from scipy.special import ndtr

from tests.reference_harness import load_reference_fns, reference_available
from ttc.change.events import (
    identify_anomaly_events,
    longest_zero_run,
    remove_noise,
    remove_nonoverlapping_events,
    temporal_filter,
)
from ttc.change.kde import REG_GRID, kde_cdf, make_all_kde
from ttc.change.pipeline import (
    assign_loss_year,
    detect_change,
    validate_ard,
)


def test_kde_cdf_matches_reference_formula(rng):
    samples = (rng.normal(2000, 800, 500)).astype(np.float32)
    got = np.asarray(kde_cdf(samples))
    kde = gaussian_kde(samples)
    # the reference's exact expression (change.py:248-251)
    ref = np.array([ndtr((g - kde.dataset).ravel()
                         / kde.factor).mean() for g in REG_GRID[::50]])
    np.testing.assert_allclose(got[::50], ref, atol=2e-3)


def test_anomaly_events_matches_reference(rng):
    if not reference_available():
        pytest.skip("no reference")
    fns = load_reference_fns("src/change/change.py",
                             ["identify_anomaly_events"])
    from numpy.lib.stride_tricks import sliding_window_view

    inp = rng.integers(0, 2, (14, 10, 10)).astype(np.int16)
    for window in (2, 3, 4, 5):
        ref = fns["identify_anomaly_events"](
            inp.copy(), 1, window)
        got = identify_anomaly_events(inp, 1, window)
        t = min(ref.shape[0], got.shape[0])
        np.testing.assert_array_equal(got[:t], ref[:t],
                                      err_msg=f"window={window}")


def test_remove_noise_small_patches():
    arr = np.zeros((30, 30), np.uint8)
    arr[2:4, 2:4] = 1          # 4 px -> removed
    arr[10:20, 10:20] = 1      # 100 px -> kept
    out = remove_noise(arr.copy(), thresh=15)
    assert out[2:4, 2:4].sum() == 0
    assert out[10:20, 10:20].sum() == 100


def test_remove_nonoverlapping():
    cand = np.zeros((20, 20), np.uint8)
    cand[2:8, 2:8] = 1
    anomaly = np.zeros_like(cand)
    out = remove_nonoverlapping_events(cand.copy(), anomaly, 2)
    assert out.sum() == 0
    anomaly[2:8, 2:8] = 1
    out = remove_nonoverlapping_events(cand.copy(), anomaly, 2)
    assert out.sum() == 36


def test_temporal_filter_removes_spikes():
    inp = np.zeros((5, 4, 4), np.float32)
    inp[2] = 10.0  # single-year spike
    out = temporal_filter(inp)
    assert out[2].max() == 0.0


def test_longest_zero_run():
    assert longest_zero_run(np.array([1, 0, 0, 0, 1, 0])) == 3
    assert longest_zero_run(np.array([1, 1])) == 0


def test_validate_ard_outlier_first_year():
    # year 0->1 has a huge NDMI jump vs all other transitions
    annual = np.array([0.1, 3.0, 3.05, 3.1, 3.0, 3.1, 3.05, 3.0])
    out = validate_ard([1] * 8, annual)
    assert out == [0]


def test_assign_loss_year():
    fs = np.zeros((4, 5, 5), np.float32)
    fs[0] = 80
    fs[1] = 75
    fs[2] = 10   # big drop year 2
    fs[3] = 12
    loss = np.zeros((3, 5, 5), np.float32)
    loss[1, 2, 2] = 2
    out = assign_loss_year(loss, fs)
    assert out[1, 2, 2] == 2  # argmin diff = index 1 -> year 2


def test_detect_change_planted_events(rng):
    """7-year synthetic: loss patch in year 3, gain patch in year 4."""
    n_years, hw = 8, 60
    t = 40
    dates = np.sort(rng.integers(0, n_years * 365, t))

    # percentile stacks: 1 = above threshold (tree-like), 0 = below
    kde5 = np.ones((t, hw, hw), np.int16)
    kde10 = np.ones((t, hw, hw), np.int16)
    kde25 = np.ones((t, hw, hw), np.int16)
    kde2 = np.ones((t, hw, hw), np.int16)

    fs = np.full((n_years, hw, hw), 80.0, np.float32)

    # loss event in 2021 (year index 4): NDMI collapses from day
    # 4*365 on, TTC drops from fs[4] on
    loss_region = (slice(10, 25), slice(10, 25))
    after_loss = dates >= 4 * 365
    for arr in (kde5, kde10, kde25, kde2):
        arr[np.ix_(after_loss, *[np.arange(10, 25)] * 2)] = 0
    for y in range(4, n_years):
        fs[(y,) + loss_region] = 5.0

    gain_year, loss_year = detect_change(kde5, kde10, kde25, kde2,
                                         dates, fs)
    assert gain_year.shape == (hw, hw)
    # loss detected inside the planted region
    assert (loss_year[12:23, 12:23] > 0).mean() > 0.5
    # no spurious loss outside
    outside = loss_year.copy()
    outside[8:27, 8:27] = 0
    assert (outside > 0).mean() < 0.05


def test_make_all_kde_shapes(rng):
    ard = (rng.normal(1000, 500, (6, 30, 30))).astype(np.int16)
    stable = np.zeros((30, 30), bool)
    stable[5:25, 5:25] = True
    f, m, b, h, pct = make_all_kde(ard, stable, maxpx=200)
    assert f.shape == ard.shape
    assert pct.max() <= 0.95 and pct.min() >= 0.0


def test_counterfactuals_match_reference(rng):
    if not reference_available():
        pytest.skip("no reference")
    import math

    from ttc.change.counterfactuals import (
        calc_reference_change,
        calc_threshold_for_notree,
        calc_tree_change,
        round_down,
    )

    fns = load_reference_fns(
        "src/change/change.py",
        ["calc_reference_change", "calc_tree_change",
         "calc_threshold_for_notree", "round_down", "round_up"])
    # NB: the reference file defines calc_tree_change twice; the
    # extraction keeps the later (winning) definition last, matching
    # Python module semantics.
    ma = rng.random((40, 50, 50)).astype(np.float32)
    dem = (rng.random((50, 50)) * 40).astype(np.float32)
    notree = rng.random((50, 50)) < 0.5
    stable = rng.random((50, 50)) < 0.5

    ref_cf = fns["calc_reference_change"](ma.copy(), 0, 20, notree, dem)
    got_cf = calc_reference_change(ma, 0, 20, notree, dem)
    np.testing.assert_allclose(got_cf, ref_cf, rtol=1e-6)

    ref_tc = fns["calc_tree_change"](ma.copy(), 90, stable, dem)
    got_tc = calc_tree_change(ma, 90, stable, dem)
    np.testing.assert_allclose(got_tc, ref_tc, rtol=1e-6)

    fns["calc_threshold_for_notree"].__globals__["round_down"] = \
        fns["round_down"]
    fns["calc_threshold_for_notree"].__globals__["math"] = math
    for v in (0.1, 0.33, 0.61, 0.9):
        np.testing.assert_allclose(
            calc_threshold_for_notree(v, got_tc),
            fns["calc_threshold_for_notree"](v, ref_tc),
            rtol=1e-6, equal_nan=True)


def test_gain_subtle_matches_reference(rng):
    if not reference_available():
        pytest.skip("no reference")
    from ttc.change.counterfactuals import check_for_gain_subtle

    fns = load_reference_fns("src/change/change.py",
                             ["check_for_gain_subtle"])
    for seed in range(10):
        r = np.random.default_rng(seed)
        ma = np.clip(r.normal(0.1, 0.12, 40), 0, 1).astype(np.float32)
        ref = [int(v) for v in fns["check_for_gain_subtle"](ma.copy())]
        got = check_for_gain_subtle(ma)
        assert got == ref, seed
    # planted: low run then sustained trees
    ma = np.concatenate([np.full(4, 0.08), np.full(3, 0.01),
                         np.full(25, 0.3)]).astype(np.float32)
    assert check_for_gain_subtle(ma) == \
        [int(v) for v in fns["check_for_gain_subtle"](ma)]


def test_gain_large_matches_reference(rng):
    if not reference_available():
        pytest.skip("no reference")
    import math

    from scipy.ndimage import minimum_filter1d

    from ttc.change.counterfactuals import check_for_gain_large

    fns = load_reference_fns(
        "src/change/change.py",
        ["check_for_gain_large", "min_filter1d",
         "calc_threshold_for_notree", "round_down"])
    g = fns["check_for_gain_large"].__globals__
    g["minimum_filter1d"] = minimum_filter1d
    g["min_filter1d"] = fns["min_filter1d"]
    g["calc_threshold_for_notree"] = fns["calc_threshold_for_notree"]
    g["round_down"] = fns["round_down"]
    g["math"] = math

    counterfactual = [0.15 + 0.01 * k + 0.05 * k for k in range(13)]
    cfs_trees = [0.1] * 12
    n_match = 0
    for seed in range(12):
        r = np.random.default_rng(seed)
        base = np.clip(r.normal(0.15, 0.05, 20), 0, 1)
        trees = np.clip(r.normal(0.6, 0.08, 20), 0, 1)
        ma = np.concatenate([base, trees]).astype(np.float32) \
            if seed % 2 else np.clip(
                r.normal(0.3, 0.15, 40), 0, 1).astype(np.float32)
        for deforested in (False, True):
            ref = fns["check_for_gain_large"](
                ma.copy(), deforested, 0.4, list(counterfactual),
                list(cfs_trees), list(cfs_trees), modifier=0.0,
                verbose=False)
            got = check_for_gain_large(
                ma, deforested, 0.4, list(counterfactual),
                list(cfs_trees), list(cfs_trees), modifier=0.0)
            assert [int(v) for v in got[0]] == \
                [int(v) for v in ref[0]], (seed, deforested)
            np.testing.assert_allclose(got[1], ref[1], atol=1e-6)
            assert got[2] == ref[2], (seed, deforested)
            n_match += 1
    assert n_match == 24


def test_filter_gain_px_accepts_real_gain(rng):
    """Planted gain patch accepted; random-noise patch rejected."""
    from ttc.change.counterfactuals import filter_gain_px

    t, hw = 40, 60
    percentiles = np.clip(rng.normal(0.15, 0.03, (t, hw, hw)), 0, 1) \
        .astype(np.float32)
    # gain patch: low -> high halfway through
    percentiles[20:, 10:30, 10:30] = np.clip(
        rng.normal(0.7, 0.03, (20, 20, 20)), 0, 1)
    gain2 = np.zeros((hw, hw), np.uint8)
    gain2[10:30, 10:30] = 3
    gain2[40:55, 40:55] = 2  # noise patch, no NDMI signal
    loss2 = np.zeros((hw, hw), np.uint8)
    fs = np.full((8, hw, hw), 20.0, np.float32)
    fs[4:, 10:30, 10:30] = 80.0
    dem = np.full((hw, hw), 5.0, np.float32)
    notree = np.ones((hw, hw), bool)
    cfs = [0.2 + 0.02 * k for k in range(13)]

    gainpx, labels, additional, gaindates = filter_gain_px(
        gain2, loss2, percentiles, fs, cfs, cfs, cfs,
        [0.1] * 12, [0.1] * 12, notree, dem,
        np.arange(t) * 70, [5] * 8)
    accepted = np.isin(labels, gainpx)
    assert accepted[15, 15]          # planted gain kept
    assert not accepted[45, 45]      # noise patch rejected


def test_make_all_kde_many_matches_single(rng):
    """Multi-tile batched calibration must reproduce the per-tile
    results bit-exactly: single tiles run through the same padded
    fixed-width program (make_all_kde is the B=1 case), including
    tiles with fewer stable pixels than maxpx."""
    from ttc.change.kde import make_all_kde_many

    maxpx = 150
    ards, stables = [], []
    for i, t in enumerate((4, 6)):
        ard = (rng.standard_normal((t, 24, 24)) * 1500).astype(np.int16)
        stable = rng.random((24, 24)) < (0.9 if i == 0 else 0.15)
        ards.append(ard)
        stables.append(stable)

    batched = make_all_kde_many(ards, stables, maxpx=maxpx, seed=7)
    for i, (ard, stable) in enumerate(zip(ards, stables)):
        single = make_all_kde(ard, stable, maxpx=maxpx, seed=7 + i)
        for a, b, name in zip(batched[i], single,
                              ("f", "m", "b", "h", "pct")):
            np.testing.assert_array_equal(a, b, err_msg=name)
