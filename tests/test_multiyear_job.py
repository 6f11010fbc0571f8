"""Multiyear job: cross-year DEM/S1 sharing and monthly backfill
(reference: src/download_and_predict_job_multiyear.py:188-330,
cloud_removal.py:1796-1860)."""
import os

import numpy as np
import pytest

from ttc.cli.multiyear_job import (_SharedRawBackend, backfill_year,
                                   run_multiyear)
from ttc.io.acquisition import FixtureBackend

HW = 110


class CountingBackend:
    """FixtureBackend wrapper that counts fetches and can blank S1
    for chosen years."""

    def __init__(self, no_s1_years=(), n_dates=10):
        self.inner = FixtureBackend(hw=HW, n_dates=n_dates)
        self.no_s1_years = set(no_s1_years)
        self.fetches = []

    def fetch(self, x, y, bbox, year):
        self.fetches.append(year)
        raw = self.inner.fetch(x, y, bbox, year)
        # vary dates by year so backfill is distinguishable
        rng = np.random.default_rng(year)
        raw.s2_dates = np.sort(rng.choice(
            np.arange(5, 360), len(raw.s2_dates), replace=False))
        if year in self.no_s1_years:
            raw.s1 = np.zeros_like(raw.s1)
        return raw


def test_shared_backend_caches_and_shares_dem():
    be = CountingBackend()
    shared = _SharedRawBackend(be, [2020, 2021])
    r0 = shared.fetch(1, 2, None, 2020)
    r0b = shared.fetch(1, 2, None, 2020)
    r1 = shared.fetch(1, 2, None, 2021)
    assert be.fetches == [2020, 2021]  # each year fetched once
    assert r0 is r0b
    # DEM raster shared across years (reference :325-328)
    assert r1.dem is r0.dem


def test_shared_backend_borrows_s1():
    be = CountingBackend(no_s1_years={2021})
    shared = _SharedRawBackend(be, [2020, 2021, 2022])
    r = shared.fetch(1, 2, None, 2021)
    assert np.any(r.s1 != 0)  # borrowed from 2020 or 2022
    donor = shared._cache[2020]
    assert r.s1 is donor.s1


def _raws_for_backfill():
    be = CountingBackend(n_dates=12)
    raws = {yy: be.inner.fetch(0, 0, None, yy) for yy in
            (2020, 2021, 2022)}
    # sparse target year: 3 dates in Jan/Feb/Mar only
    raws[2021].s2_10 = raws[2021].s2_10[:3]
    raws[2021].s2_20 = raws[2021].s2_20[:3]
    raws[2021].clouds = raws[2021].clouds[:3]
    raws[2021].s2_dates = np.array([10, 40, 70])
    # donors: spread over the year
    raws[2020].s2_dates = np.arange(15, 360, 30)  # every month
    raws[2022].s2_dates = np.arange(20, 360, 30)
    return raws


def test_backfill_fills_missing_months():
    raws = _raws_for_backfill()
    out = backfill_year(raws, 2021, min_dates=8)
    doy = np.asarray(out.s2_dates)
    assert len(doy) > 3
    assert np.all(np.diff(doy) >= 0)  # sorted
    # months 4-12 now covered (donor has an image every month)
    month_edges = np.cumsum([0, 31, 28, 31, 30, 31, 30, 31, 31, 30,
                             31, 30, 31])
    months = set(np.searchsorted(month_edges, doy % 365,
                                 side="right") - 1)
    assert months >= set(range(12))
    # stacks stayed aligned
    assert out.s2_10.shape[0] == len(doy)
    assert out.s2_20.shape[0] == len(doy)
    assert out.clouds.shape[0] == len(doy)
    # original target-year dates retained
    assert {10, 40, 70} <= set(doy.tolist())


def test_backfill_noop_when_dense():
    raws = _raws_for_backfill()
    out = backfill_year(raws, 2020, min_dates=8)
    assert out is raws[2020]


@pytest.mark.slow
def test_run_multiyear_end_to_end(tmp_path):
    import jax

    from ttc.core.config import InferenceConfig
    from ttc.infer.pipeline import TilePredictor
    from ttc.models.unet import TreeCoverNet

    model = TreeCoverNet()
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), np.zeros((1, 5, 28, 28, 17),
                                        np.float32))
    predictor = TilePredictor(
        params, InferenceConfig(tile_px=HW, out_size=66, n_rows=3),
        model)
    be = CountingBackend(no_s1_years={2021})
    rasters = run_multiyear(3, 4, 2020, 2021, str(tmp_path),
                            backend=be, predictor=predictor)
    assert sorted(rasters) == [2020, 2021]
    for year in (2020, 2021):
        tif = os.path.join(str(tmp_path), str(year), "3", "4",
                           "3X4Y_FINAL.tif")
        assert os.path.exists(tif)
        assert rasters[year].shape == (HW, HW)
    # each year acquired exactly once despite the S1 borrow
    assert sorted(be.fetches) == [2020, 2021]
