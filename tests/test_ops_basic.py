"""Indices, slope, filters, codecs, masked reductions: golden parity."""
import numpy as np
import pytest
from scipy import ndimage

from tests.reference_harness import load_reference_fns, reference_available
from ttc.core.codecs import from_uint16, ndmi_to_int16, to_db, to_uint16
from ttc.core.datacube import DateStack, masked_median
from ttc.ops import indices as jidx
from ttc.ops.filters import fspecial_gauss, median_filter
from ttc.ops.slope import calc_slope


@pytest.fixture(scope="module")
def ref_idx():
    if not reference_available():
        pytest.skip("no reference")
    return load_reference_fns(
        "src/preprocessing/indices.py", ["evi", "bi", "msavi2", "grndvi"])


def test_indices_match_reference(ref_idx, rng):
    x = rng.random((4, 16, 16, 10)).astype(np.float32)
    for name, mine in [("evi", jidx.evi), ("bi", jidx.bi),
                       ("msavi2", jidx.msavi2), ("grndvi", jidx.grndvi)]:
        ref = ref_idx[name](x.copy())
        got = np.asarray(mine(x))
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_slope_matches_reference_loop(rng):
    if not reference_available():
        pytest.skip("no reference")
    fns = load_reference_fns("src/preprocessing/slope.py",
                             ["slopePython", "calcSlope"])
    dem = (rng.random((20, 20)) * 100).astype(np.float32)
    xs = np.full((20, 20), 10.0)
    ref = fns["calcSlope"](dem[np.newaxis], xs, xs, minSlope=0.02)[0]
    got = np.asarray(calc_slope(dem, 10.0, 10.0, min_slope=0.02))
    np.testing.assert_allclose(got[1:-1, 1:-1], ref[1:-1, 1:-1],
                               rtol=1e-4, atol=1e-4)


def test_median_filter_matches_scipy(rng):
    x = rng.random((24, 24)).astype(np.float32)
    got = np.asarray(median_filter(x, 5))
    ref = ndimage.median_filter(x, size=5, mode="reflect")
    np.testing.assert_allclose(got, ref)


def test_fspecial_gauss_matches_reference():
    if not reference_available():
        pytest.skip("no reference")
    fns = load_reference_fns("src/download_and_predict_job.py",
                             ["fspecial_gauss"])
    ref = fns["fspecial_gauss"](158, 36)
    got = fspecial_gauss(158, 36)
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_uint16_roundtrip(rng):
    x = rng.random((8, 8)).astype(np.float32)
    enc = to_uint16(x)
    assert enc.dtype == np.uint16
    dec = from_uint16(enc)
    np.testing.assert_allclose(dec, x, atol=1.0 / 65535)


def test_to_db_matches_reference(rng):
    if not reference_available():
        pytest.skip("no reference")
    fns = load_reference_fns("src/download_and_predict_job.py",
                             ["convert_to_db"])
    x = (rng.random((3, 10, 10, 2)) * 0.5).astype(np.float32)
    ref = fns["convert_to_db"](x.copy(), 22)
    got = to_db(x, 22)
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_ndmi_quantization():
    x = np.array([0.12344, -0.5, 0.99999], dtype=np.float32)
    out = ndmi_to_int16(x)
    assert out.dtype == np.int16
    assert np.all(out % 5 == 0)


def test_masked_median_matches_numpy(rng):
    data = rng.random((9, 6, 6, 4)).astype(np.float32)
    valid = np.array([1, 1, 0, 1, 1, 1, 0, 1, 0], dtype=bool)
    got = np.asarray(masked_median(data, valid))
    ref = np.median(data[valid], axis=0)
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_datestack_pack_drop(rng):
    data = rng.random((5, 4, 4, 2)).astype(np.float32)
    doy = np.array([10, 50, 120, 200, 300])
    ds = DateStack.from_arrays(data, doy, capacity=8)
    assert ds.capacity == 8
    assert int(ds.n_valid()) == 5
    kill = np.zeros(8, bool)
    kill[1] = True
    ds2 = ds.drop(kill)
    assert int(ds2.n_valid()) == 4
    np.testing.assert_allclose(
        np.asarray(ds2.masked_median()),
        np.median(data[[0, 2, 3, 4]], axis=0), rtol=1e-6)
