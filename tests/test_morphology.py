"""Morphology ops vs scipy.ndimage golden outputs."""
import numpy as np
from scipy import ndimage

from ttc.ops.morphology import (
    capped_edt,
    dilate,
    erode,
    feathered_weight,
    grey_closing,
    maximum_filter,
)


def _rand_mask(seed, shape=(40, 40), p=0.2):
    rng = np.random.default_rng(seed)
    return (rng.random(shape) < p).astype(np.float32)


def test_dilate_cross_matches_scipy():
    m = _rand_mask(0)
    for iters in (1, 2, 5):
        got = np.asarray(dilate(m, iterations=iters))
        ref = ndimage.binary_dilation(m, iterations=iters).astype(np.float32)
        np.testing.assert_array_equal(got, ref)


def test_dilate_full_structure_matches_scipy():
    m = _rand_mask(1)
    struct = ndimage.generate_binary_structure(2, 2)
    got = np.asarray(dilate(m, iterations=3, cross=False))
    ref = ndimage.binary_dilation(m, structure=struct,
                                  iterations=3).astype(np.float32)
    np.testing.assert_array_equal(got, ref)


def test_erode_cross_matches_scipy():
    m = 1.0 - _rand_mask(2, p=0.1)
    for iters in (1, 2):
        got = np.asarray(erode(m, iterations=iters))
        ref = ndimage.binary_erosion(m, iterations=iters).astype(np.float32)
        np.testing.assert_array_equal(got, ref)


def test_batched_leading_axes():
    m = np.stack([_rand_mask(i) for i in range(3)])
    got = np.asarray(dilate(m, iterations=2))
    for i in range(3):
        ref = ndimage.binary_dilation(m[i], iterations=2).astype(np.float32)
        np.testing.assert_array_equal(got[i], ref)


def test_maximum_filter_matches_scipy():
    rng = np.random.default_rng(3)
    x = rng.random((30, 30)).astype(np.float32)
    got = np.asarray(maximum_filter(x, 5))
    # interior agrees exactly; scipy reflects at the border while
    # reduce_window pads with -inf (takes max of in-bounds values);
    # for max over reflected values these coincide.
    ref = ndimage.maximum_filter(x, size=5, mode="reflect")
    np.testing.assert_allclose(got, ref)


def test_grey_closing_interior_matches_scipy():
    rng = np.random.default_rng(4)
    x = rng.random((40, 40)).astype(np.float32)
    got = np.asarray(grey_closing(x, 5))
    ref = ndimage.grey_closing(x, size=5, mode="reflect")
    np.testing.assert_allclose(got[4:-4, 4:-4], ref[4:-4, 4:-4])


def test_capped_edt_close_to_exact():
    m = _rand_mask(5, p=0.05).astype(bool)
    cap = 12.0
    got = np.asarray(capped_edt(m, cap))
    exact = np.minimum(ndimage.distance_transform_edt(~m), cap)
    # chamfer 1/sqrt(2) metric overestimates euclidean by at most ~8%
    assert np.all(got >= exact - 1e-5)
    assert np.max(got - exact) <= 0.09 * cap
    # zero at mask pixels, capped far away
    assert np.all(got[m] == 0)


def test_feathered_weight_range():
    m = _rand_mask(6, p=0.1).astype(bool)
    w = np.asarray(feathered_weight(m, 12.0))
    assert np.all(w >= 0) and np.all(w <= 1)
    assert np.all(w[m] == 1.0)
