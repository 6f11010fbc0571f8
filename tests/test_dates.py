"""Date selection: parity vs the reference subset_contiguous_sunny_dates."""
import numpy as np
import pytest

from tests.reference_harness import load_reference_fns, reference_available
from ttc.preprocess.dates import select_sunny_dates, summarize_dates

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="no reference")


@pytest.fixture(scope="module")
def ref_fn():
    fns = load_reference_fns(
        "src/preprocessing/cloud_removal.py",
        ["subset_contiguous_sunny_dates", "print_dates"])
    return fns["subset_contiguous_sunny_dates"]


@pytest.mark.parametrize("seed", range(8))
def test_select_matches_reference(seed, ref_fn):
    rng = np.random.default_rng(seed)
    n = rng.integers(4, 30)
    dates = np.sort(rng.choice(np.arange(-40, 400), n, replace=False))
    probs = rng.random(n) * 0.6
    ref = sorted(int(i) for i in ref_fn(dates.copy(), probs.copy()))
    got = sorted(int(i) for i in select_sunny_dates(dates, probs))
    assert got == ref, (dates.tolist(), probs.tolist())


def test_select_keeps_few_dates(ref_fn):
    dates = np.array([30, 90, 200])
    probs = np.array([0.1, 0.1, 0.1])
    assert select_sunny_dates(dates, probs) == []


def test_summarize_dates_reports_duplicates():
    dates = np.array([10, 10, 40, 200])
    probs = np.array([0.1, 0.2, 0.1, 0.3])
    monthly, dupes = summarize_dates(dates, probs)
    assert dupes == [10]
    assert len(monthly) == 3
