"""End-to-end ARD + inference integration on the fixture backend."""
import numpy as np
import pytest

import jax

from ttc.core.config import InferenceConfig
from ttc.infer.pipeline import TilePredictor
from ttc.io.acquisition import (
    FixtureBackend,
    check_for_alt_img,
    extract_dates,
    s1_quarterly_to_monthly,
    screen_cloud_previews,
    to_float32_strict,
    to_int16_strict,
)
from ttc.models.unet import TreeCoverNet
from ttc.preprocess.ard import process_tile, smooth_tile


def test_extract_dates_matches_reference():
    from tests.reference_harness import load_reference_fns, reference_available
    if not reference_available():
        pytest.skip("no reference")
    import datetime

    fns = load_reference_fns("src/tof/tof_downloading.py",
                             ["extract_dates"])
    dd = [datetime.date(2023, 1, 5), datetime.date(2023, 6, 20),
          datetime.date(2022, 12, 28), datetime.date(2024, 1, 3)]
    assert extract_dates(dd, 2023) == fns["extract_dates"](dd, 2023)


def test_int16_roundtrip_strict(rng):
    x = rng.random((4, 8, 8)).astype(np.float32)
    enc = to_int16_strict(x)
    dec = to_float32_strict(enc)
    np.testing.assert_allclose(dec, x, atol=1.0 / 65535)


def test_check_for_alt_img_matches_reference():
    from tests.reference_harness import load_reference_fns, reference_available
    if not reference_available():
        pytest.skip("no reference")
    fns = load_reference_fns("src/tof/tof_downloading.py",
                             ["_check_for_alt_img"])
    rng = np.random.default_rng(0)
    for _ in range(20):
        n = rng.integers(2, 12)
        dates = np.sort(rng.choice(np.arange(0, 365), n, replace=False))
        probs = rng.random(n)
        d = dates[rng.integers(0, n)]
        assert check_for_alt_img(probs, dates, d) == \
            fns["_check_for_alt_img"](probs, dates, d)


def test_screen_cloud_previews(rng):
    t = 8
    img = rng.random((t, 40, 40)).astype(np.float32) * 30
    img[3] = 90.0            # very cloudy date -> dropped
    img[5, 15:25, 15:25] = 255  # nodata center -> dropped
    dates = np.arange(10, 10 + t * 40, 40)
    out_img, pct, out_dates, local = screen_cloud_previews(img, dates)
    # >50% cloud date dropped; nodata-in-center survives (the
    # reference's mean>10 removal rule is inert and replicated as-is)
    assert dates[3] not in out_dates
    assert dates[5] in out_dates
    assert out_img.max() <= 1.0
    assert len(pct) == len(out_dates) == len(local)
    # the nodata block doesn't poison the cloud stats (nan-ignored)
    assert np.isfinite(pct).all()


def test_s1_monthly_regrid(rng):
    q = rng.random((4, 16, 16, 2)).astype(np.float32)
    monthly = s1_quarterly_to_monthly(q, np.array([45, 136, 227, 318]))
    assert monthly.shape == (12, 16, 16, 2)
    assert np.isfinite(monthly).all()


@pytest.mark.slow
def test_full_ard_to_prediction():
    """Fixture raw tile -> ARD -> smoothed -> tree cover raster."""
    backend = FixtureBackend(seed=1, n_dates=9, hw=110)
    raw = backend.fetch(0, 0, None, 2023)
    tile = process_tile(raw)
    assert tile.s2.shape[-1] == 10
    assert tile.s2.min() >= 0 and tile.s2.max() <= 1
    assert tile.interp.shape == tile.s2.shape[:3]

    sm = smooth_tile(tile)
    assert sm.s2.shape == (12, 110, 110, 14)
    assert np.isfinite(sm.s2).all()

    # out_size must keep in_size = out+14 divisible by 4 (U-Net skip
    # crops); 66 -> 80 works at 110 px tiles
    cfg = InferenceConfig(tile_px=110, out_size=66, n_rows=3)
    model = TreeCoverNet()
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), np.zeros((1, 5, 28, 28, 17), np.float32))
    predictor = TilePredictor(params, cfg, model)
    raster = np.asarray(predictor(
        sm.s2, sm.s1, sm.dem, sm.s2_median, sm.s1_median,
        sm.clear_count))
    assert raster.shape == (110, 110)
    assert raster.dtype == np.uint8
    valid = raster[raster != 255]
    assert len(valid) > 0 and valid.max() <= 100


def test_fused_smooth_matches_two_stage():
    """process_and_smooth_tile (smoothing fused into the ARD dispatch)
    must equal smooth_tile(process_tile(raw)) — masking outputs and
    dates exactly; the smoothed monthly cube to one float ulp. The
    fused path contracts the composed (12, T) smoothing operator over
    the fixed-capacity date axis (dropped slots carry exact zero
    weights), while the standalone path contracts over the compacted
    axis — mathematically identical, but XLA's reduction-tree grouping
    of the real terms shifts around interior zero slots, so results
    agree to the last ulp rather than bitwise."""
    from ttc.preprocess.ard import process_and_smooth_tile

    backend = FixtureBackend(seed=4, n_dates=9, hw=64)
    raw = backend.fetch(0, 0, None, 2023)

    tile_a = process_tile(raw)
    sm_a = smooth_tile(tile_a)
    tile_b, sm_b = process_and_smooth_tile(raw)

    np.testing.assert_array_equal(np.asarray(tile_a.s2),
                                  np.asarray(tile_b.s2))
    np.testing.assert_array_equal(tile_a.dates, tile_b.dates)
    for f in ("s2", "s2_median", "s1_median", "clear_count"):
        np.testing.assert_allclose(
            np.asarray(getattr(sm_a, f)), np.asarray(getattr(sm_b, f)),
            rtol=0, atol=4e-7, err_msg=f)


def test_prepped_device_arrays_match_raw_path():
    """process_tile(prepped=host_prepare(raw)) with pre-device_put
    arrays must equal process_tile(raw) exactly — the bench's
    device-resident timing path must not change numerics."""
    from ttc.preprocess.ard import host_prepare

    backend = FixtureBackend(seed=5, n_dates=9, hw=64)
    raw = backend.fetch(0, 0, None, 2023)

    tile_a, sm_a = process_tile(raw, smooth=True)
    prep = host_prepare(raw)
    for k in ("s2_10", "s2_20", "s1", "dem"):
        prep[k] = jax.device_put(prep[k])
    tile_b, sm_b = process_tile(prepped=prep, smooth=True)

    np.testing.assert_array_equal(np.asarray(tile_a.s2),
                                  np.asarray(tile_b.s2))
    np.testing.assert_array_equal(tile_a.dates, tile_b.dates)
    for f in ("s2", "s2_median", "s1_median", "clear_count"):
        np.testing.assert_array_equal(
            np.asarray(getattr(sm_a, f)), np.asarray(getattr(sm_b, f)),
            err_msg=f)


@pytest.mark.slow
def test_batched_ard_matches_per_tile():
    """process_and_smooth_tiles (vmapped fused batch) must match the
    per-tile path tile-for-tile — including when a heavy-cloud tile
    triggers cascade re-dispatches that re-run settled tiles (the
    re-run is idempotent), and when a different date-bucket forces a
    tile out of the batch group."""
    from ttc.preprocess.ard import (process_and_smooth_tile,
                                    process_and_smooth_tiles)

    raws = [
        FixtureBackend(seed=4, n_dates=9, hw=64).fetch(0, 0, None,
                                                       2023),
        FixtureBackend(seed=7, n_dates=9, hw=64,
                       cloud_fraction=0.6).fetch(0, 0, None, 2023),
        # n_dates=7 buckets to cap 8 (not 12): exercises group fallback
        FixtureBackend(seed=2, n_dates=7, hw=64).fetch(0, 0, None,
                                                       2023),
    ]
    batch = process_and_smooth_tiles(raws)
    assert len(batch) == 3
    for raw, (tile_b, sm_b) in zip(raws, batch):
        tile_a, sm_a = process_and_smooth_tile(raw)
        np.testing.assert_array_equal(tile_a.dates, tile_b.dates)
        np.testing.assert_allclose(np.asarray(tile_a.s2),
                                   np.asarray(tile_b.s2),
                                   rtol=0, atol=1e-6)
        for f in ("s2", "s2_median", "s1_median", "clear_count"):
            np.testing.assert_allclose(
                np.asarray(getattr(sm_a, f)),
                np.asarray(getattr(sm_b, f)), rtol=0, atol=1e-5,
                err_msg=f)


def test_batched_ard_mixed_dtypes_fall_back():
    """Tiles whose wire arrays have different dtypes must NOT share a
    vmap batch group: jnp.stack would silently promote uint16 ->
    float32 and skip _ingest's dtype-dispatched decode. The float32
    (pre-decoded) tile falls back to the single-tile path and both
    results still match the per-tile reference."""
    from ttc.preprocess.ard import (host_prepare,
                                    process_and_smooth_tile,
                                    process_and_smooth_tiles)

    raw_a = FixtureBackend(seed=4, n_dates=9, hw=64).fetch(0, 0, None,
                                                           2023)
    raw_b = FixtureBackend(seed=5, n_dates=9, hw=64).fetch(0, 0, None,
                                                           2023)
    preps = [host_prepare(raw_a), host_prepare(raw_b)]
    assert preps[0]["s2_10"].dtype == np.uint16
    # pre-decode tile b's S2 stacks to float32 (legacy float wire)
    for k in ("s2_10", "s2_20"):
        preps[1][k] = (preps[1][k].astype(np.float32) / 65535.0)

    batch = process_and_smooth_tiles(prepped_list=preps)
    for raw, (tile_b, sm_b) in zip((raw_a, raw_b), batch):
        _, sm_a = process_and_smooth_tile(raw)
        np.testing.assert_allclose(np.asarray(sm_a.s2),
                                   np.asarray(sm_b.s2), rtol=0,
                                   atol=1e-5)


def test_batched_ard_pad_to_matches_unpadded():
    """pad_to pads short groups by repeating the last prep so they
    reuse the compiled tile_batch-size program; results must be
    identical to the unpadded batch (extra outputs dropped)."""
    from ttc.preprocess.ard import process_and_smooth_tiles

    raws = [
        FixtureBackend(seed=4, n_dates=9, hw=64).fetch(0, 0, None,
                                                       2023),
        FixtureBackend(seed=5, n_dates=9, hw=64).fetch(0, 0, None,
                                                       2023),
    ]
    ref = process_and_smooth_tiles(raws)
    got = process_and_smooth_tiles(raws, pad_to=4)
    assert len(got) == len(ref) == 2
    for (_, sm_a), (_, sm_b) in zip(ref, got):
        for f in ("s2", "s2_median", "s1_median", "clear_count"):
            np.testing.assert_array_equal(np.asarray(getattr(sm_a, f)),
                                          np.asarray(getattr(sm_b, f)),
                                          err_msg=f)


@pytest.mark.slow
def test_batched_ard_with_sr_matches_per_tile():
    """process_and_smooth_tiles(sr_params=...) — super-resolution fused
    between the batched masking and smoothing dispatches — must match
    the explicit per-tile sequence process -> superresolve -> smooth,
    including when the cascade drops dates (SR must land on the final
    validity, never a pre-cascade stack)."""
    import jax.numpy as jnp

    from ttc.models.superres import superresolve_tile
    from ttc.preprocess.ard import process_and_smooth_tiles

    rng = jax.random.PRNGKey(0)
    from ttc.models.superres import SuperResolver

    sr_params = SuperResolver().init(
        rng, np.zeros((1, 16, 16, 10), np.float32),
        np.zeros((1, 16, 16, 6), np.float32))

    raws = [
        FixtureBackend(seed=4, n_dates=9, hw=64).fetch(0, 0, None,
                                                       2023),
        FixtureBackend(seed=7, n_dates=9, hw=64,
                       cloud_fraction=0.6).fetch(0, 0, None, 2023),
    ]
    batch = process_and_smooth_tiles(raws, sr_params=sr_params)
    assert len(batch) == 2
    for raw, (tile_b, sm_b) in zip(raws, batch):
        tile_a = process_tile(raw)
        tile_a.s2 = superresolve_tile(sr_params, jnp.asarray(tile_a.s2))
        sm_a = smooth_tile(tile_a)
        np.testing.assert_array_equal(tile_a.dates, tile_b.dates)
        np.testing.assert_allclose(np.asarray(tile_a.s2),
                                   np.asarray(tile_b.s2),
                                   rtol=0, atol=1e-5)
        for f in ("s2", "s2_median", "s1_median", "clear_count"):
            np.testing.assert_allclose(
                np.asarray(getattr(sm_a, f)),
                np.asarray(getattr(sm_b, f)), rtol=0, atol=1e-4,
                err_msg=f)
