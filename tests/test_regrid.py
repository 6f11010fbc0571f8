"""Parity tests: temporal regrid weight matrix vs the reference's
calculate_and_save_best_images, on random ragged stacks."""
import numpy as np
import pytest

from tests.reference_harness import load_reference_fns, reference_available
from ttc.ops.regrid import apply_regrid, regrid_weights

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present")


@pytest.fixture(scope="module")
def ref_fn():
    fns = load_reference_fns(
        "src/downloading/utils.py", ["calculate_and_save_best_images"])
    return fns["calculate_and_save_best_images"]


def _random_stack(rng, n_dates, h=6, w=6, c=3):
    data = rng.random((n_dates, h, w, c)).astype(np.float32)
    doy = np.sort(rng.choice(np.arange(0, 365), size=n_dates, replace=False))
    return data, doy.astype(np.int64)


@pytest.mark.parametrize("n_dates", [3, 5, 9, 14])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_regrid_matches_reference(n_dates, seed, ref_fn):
    rng = np.random.default_rng(seed)
    data, doy = _random_stack(rng, n_dates)

    expected, ref_gap = ref_fn(data.copy(), doy.copy())
    weights, gap = regrid_weights(doy)
    got = np.asarray(apply_regrid(data, weights))

    assert expected.shape == (24,) + data.shape[1:]
    np.testing.assert_allclose(got, expected, rtol=2e-5, atol=2e-5)
    assert gap == ref_gap


def test_regrid_sparse_winter_gap(ref_fn):
    """Dates clustered late in the year exercise the wraparound flags."""
    rng = np.random.default_rng(7)
    data = rng.random((4, 5, 5, 2)).astype(np.float32)
    doy = np.array([150, 180, 210, 300])
    expected, _ = ref_fn(data.copy(), doy.copy())
    weights, _ = regrid_weights(doy)
    got = np.asarray(apply_regrid(data, weights))
    np.testing.assert_allclose(got, expected, rtol=2e-5, atol=2e-5)


def test_regrid_early_year_only(ref_fn):
    rng = np.random.default_rng(8)
    data = rng.random((3, 4, 4, 2)).astype(np.float32)
    doy = np.array([20, 45, 70])
    expected, _ = ref_fn(data.copy(), doy.copy())
    weights, _ = regrid_weights(doy)
    got = np.asarray(apply_regrid(data, weights))
    np.testing.assert_allclose(got, expected, rtol=2e-5, atol=2e-5)


def test_regrid_masked_slots_match_dense():
    """Weights over a fixed-capacity masked stack equal the dense ones."""
    rng = np.random.default_rng(3)
    data, doy = _random_stack(rng, 7)
    w_dense, gap_dense = regrid_weights(doy)

    cap = 12
    doy_p = np.concatenate([doy, np.zeros(cap - 7, np.int64)])
    valid = np.concatenate([np.ones(7, bool), np.zeros(cap - 7, bool)])
    w_masked, gap_masked = regrid_weights(doy_p, valid)

    np.testing.assert_allclose(w_masked[:, :7], w_dense)
    assert np.all(w_masked[:, 7:] == 0)
    assert gap_dense == gap_masked


def test_weights_rows_normalized():
    rng = np.random.default_rng(5)
    _, doy = _random_stack(rng, 10)
    weights, _ = regrid_weights(doy)
    np.testing.assert_allclose(weights.sum(axis=1), 1.0, atol=1e-5)
