"""Sort-free order statistics: exact equivalence with jnp/np sorts.

These ops replace XLA `sort` in the ARD hot path (shadow-pass window
medians, mosaic alignment medians, percentile thresholds); every
replacement must be bit-exact, so the tests compare against the
numpy/jnp formulations they displace."""
import jax.numpy as jnp
import numpy as np
import pytest

from ttc.ops.sortnet import (
    masked_kth,
    masked_median,
    masked_median_axis0,
    masked_quantile,
    median_axis0,
    quantile_axis0,
    sort_axis0,
)

RNG = np.random.default_rng(7)


@pytest.mark.parametrize("t", [1, 2, 3, 7, 12, 25])
def test_sort_axis0_matches_npsort(t):
    x = RNG.standard_normal((t, 9, 5)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(sort_axis0(jnp.asarray(x))),
                                  np.sort(x, axis=0))


@pytest.mark.parametrize("t", [3, 4, 12, 13])
def test_median_axis0(t):
    x = RNG.standard_normal((t, 17)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(median_axis0(jnp.asarray(x))),
                               np.median(x, axis=0), rtol=0, atol=0)


@pytest.mark.parametrize("pct", [10.0, 25.0, 50.0, 99.0, 100.0])
def test_quantile_axis0(pct):
    x = RNG.standard_normal((12, 31)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(quantile_axis0(jnp.asarray(x), pct)),
        np.percentile(x, pct, axis=0).astype(np.float32), atol=2e-6)


def test_masked_median_axis0_matches_nan_deletion():
    t = 9
    x = RNG.standard_normal((t, 6, 4)).astype(np.float32)
    bad = RNG.random((t, 6, 4)) < 0.4
    bad[:, 0, 0] = True  # one all-bad pixel
    med, empty = masked_median_axis0(jnp.asarray(x), jnp.asarray(bad))
    med, empty = np.asarray(med), np.asarray(empty)
    ref = np.where(bad, np.nan, x)
    with np.errstate(all="ignore"):
        want = np.nanmedian(ref, axis=0)
    ok = ~np.all(bad, axis=0)
    np.testing.assert_allclose(med[ok], want[ok], atol=0)
    assert empty[0, 0] and not empty[1, 1]


def test_masked_kth_exact_and_per_batch_k():
    n = 4001
    x = RNG.standard_normal((n, 3)).astype(np.float32) * 100
    x[17, 0] = x[18, 0]  # ties
    keep = RNG.random((n, 3)) < 0.7
    counts = keep.sum(axis=0)
    k = np.stack([counts // 3, counts // 2, counts - 1]).diagonal()
    got = np.asarray(masked_kth(jnp.asarray(x), jnp.asarray(keep),
                                jnp.asarray(k, np.int32)))
    for j in range(3):
        want = np.sort(x[keep[:, j], j])[k[j]]
        assert got[j] == want  # bit-exact


def test_masked_kth_negative_values_and_axis():
    x = RNG.standard_normal((5, 1000)).astype(np.float32) - 0.5
    keep = np.ones_like(x, bool)
    got = np.asarray(masked_kth(jnp.asarray(x), jnp.asarray(keep),
                                499, axis=1))
    want = np.sort(x, axis=1)[:, 499]
    np.testing.assert_array_equal(got, want)


def test_masked_median_matches_nanmedian():
    x = RNG.standard_normal((2000, 4)).astype(np.float32)
    keep = RNG.random((2000, 4)) < 0.6
    med, n = masked_median(jnp.asarray(x), jnp.asarray(keep))
    ref = np.where(keep, x, np.nan)
    want = np.nanmedian(ref, axis=0)
    np.testing.assert_allclose(np.asarray(med), want, atol=0)
    np.testing.assert_array_equal(np.asarray(n), keep.sum(axis=0))


def test_masked_quantile_matches_nanpercentile():
    x = RNG.standard_normal((3000,)).astype(np.float32)
    keep = RNG.random(3000) < 0.8
    pcts = np.array([2.0, 20.0, 50.0, 98.0])
    got = np.asarray(masked_quantile(jnp.asarray(x), jnp.asarray(keep),
                                     pcts))
    want = np.nanpercentile(np.where(keep, x, np.nan), pcts)
    np.testing.assert_allclose(got, want.astype(np.float32),
                               rtol=1e-6, atol=1e-6)
