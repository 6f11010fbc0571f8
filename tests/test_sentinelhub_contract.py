"""Offline contract tests for the live acquisition client.

A fake `sentinelhub` module (installed via sys.modules) returns
recorded-shape responses so SentinelHubBackend.fetch() executes END TO
END offline, asserting the request payloads the reference's production
client built for years: evalscript choice, bbox expansion, sizes,
mosaicking order, per-date time intervals, the S1 orbitDirection
filter and year/orbit fallback ladder, and the DATA_QUALITY screen
(reference: src/tof/tof_downloading.py:913-1140, 527-714,
src/download_and_predict_job.py:425-459,497-499)."""
import datetime as dt
import sys
import types

import numpy as np
import pytest

from ttc.io import acquisition as acq

# tile bbox with h10 = 64 px (0.0178 deg at 10 m/px)
H10 = 64
BBOX = (30.0, -5.0, 30.0 + H10 / 3600.0, -5.0 + H10 / 3600.0)
YEAR = 2023


class _Recorder:
    def __init__(self):
        self.process = []          # SentinelHubRequest payloads
        self.wcs = []              # WcsRequest payloads


def _install_fake(monkeypatch, rec, bad_quality_doy=None,
                  s1_nan_years=()):
    mod = types.ModuleType("sentinelhub")

    class SHConfig:
        def __init__(self):
            self.instance_id = ""
            self.sh_client_id = ""
            self.sh_client_secret = ""

    class CRS:
        WGS84 = "WGS84"

    class MimeType:
        TIFF = "tiff"

    class _Coll:
        def __init__(self, name):
            self.name = name

    class DataCollection:
        SENTINEL2_L2A = _Coll("SENTINEL2_L2A")
        SENTINEL1_IW = _Coll("SENTINEL1_IW")
        DEM_COPERNICUS_30 = _Coll("DEM_COPERNICUS_30")

    class BBox:
        def __init__(self, coords, crs):
            self.coords = list(coords)
            self.crs = crs

    class SentinelHubRequest:
        def __init__(self, evalscript, input_data, responses, bbox,
                     size, config):
            self.evalscript = evalscript
            self.input_data = input_data
            self.bbox = bbox
            self.size = size
            rec.process.append({
                "evalscript": evalscript,
                "input": input_data[0],
                "bbox": bbox.coords,
                "size": tuple(size),
            })

        @staticmethod
        def input_data(data_collection, **kwargs):
            return {"collection": data_collection.name, **kwargs}

        @staticmethod
        def output_response(name, fmt):
            return (name, fmt)

        def get_data(self):
            w, h = self.size
            inp = self.input_data[0]
            coll = inp["collection"]
            interval = inp.get("time_interval")
            if self.evalscript is acq.EVALSCRIPT_DEM:
                return [np.full((h, w, 1), 12300, np.uint16)]
            if coll == "SENTINEL1_IW":
                y = int(interval[0][:4])
                val = np.nan if y in s1_nan_years else 0.06
                return [np.full((h, w, 2), val, np.float32)]
            if self.evalscript is acq.EVALSCRIPT_DATA_QUALITY:
                doy = _interval_doy(interval)
                bad = bad_quality_doy is not None \
                    and doy == bad_quality_doy
                return [np.full((h, w, 1), 255 if bad else 0,
                                np.uint8)]
            if self.evalscript is acq.EVALSCRIPT_CIRRUS:
                return [np.zeros((h, w, 1), np.uint8)]
            if self.evalscript is acq.EVALSCRIPT_L2A10:
                return [np.full((h, w, 4), 3000, np.uint16)]
            if self.evalscript is acq.EVALSCRIPT_L2A20:
                return [np.full((h, w, 4), 2500, np.uint16)]
            if self.evalscript is acq.EVALSCRIPT_L2A40:
                return [np.full((h, w, 2), 2000, np.uint16)]
            raise AssertionError("unexpected evalscript")

    class WcsRequest:
        def __init__(self, **kwargs):
            self.kwargs = kwargs
            rec.wcs.append(kwargs)

        def get_dates(self):
            return [dt.datetime(YEAR, m, 15) for m in range(1, 13)]

        def get_data(self):
            # 12 low-cloud previews over the 15x bbox at 640 m
            return [np.full((42, 42), 5.0, np.float32)
                    for _ in range(12)]

    mod.SHConfig = SHConfig
    mod.CRS = CRS
    mod.MimeType = MimeType
    mod.DataCollection = DataCollection
    mod.BBox = BBox
    mod.SentinelHubRequest = SentinelHubRequest
    mod.WcsRequest = WcsRequest
    monkeypatch.setitem(sys.modules, "sentinelhub", mod)
    return mod


def _interval_doy(interval):
    start = dt.date.fromisoformat(interval[0])
    mid = start + dt.timedelta(days=1)
    return (mid - dt.date(mid.year, 1, 1)).days + 1


@pytest.fixture
def backend(monkeypatch):
    rec = _Recorder()
    _install_fake(monkeypatch, rec)
    return acq.SentinelHubBackend(instance_id="fake"), rec


def test_fetch_end_to_end_shapes(backend):
    be, rec = backend
    raw = be.fetch(0, 0, BBOX, YEAR)
    t = len(raw.s2_dates)
    assert t >= 6
    assert raw.s2_10.shape == (t, H10, H10, 4)
    assert raw.s2_10.dtype == np.uint16
    assert raw.s2_20.shape == (t, H10 // 2, H10 // 2, 6)
    assert raw.s1.shape == (4, H10, H10, 2)         # quarterly wire
    assert raw.s1.dtype == np.uint16
    assert raw.s1_dates.shape == (4,)
    assert raw.dem.shape == (H10, H10)
    assert raw.cirrus.shape[0] == t
    assert be.budget.n_requests > 0 and be.budget.total_pu > 0


def test_preview_bbox_expanded_15x(backend):
    be, rec = backend
    be.fetch(0, 0, BBOX, YEAR)
    wcs = rec.wcs[0]
    big = wcs["bbox"].coords
    assert (big[2] - big[0]) > 10 * (BBOX[2] - BBOX[0])
    assert wcs["layer"] == "CLOUD_SCL_PREVIEW"
    assert wcs["resx"] == "640m" and wcs["resy"] == "640m"
    assert wcs["maxcc"] == 0.5


def test_s2_requests_sizes_intervals_mosaicking(backend):
    be, rec = backend
    raw = be.fetch(0, 0, BBOX, YEAR)
    l10 = [p for p in rec.process
           if p["evalscript"] is acq.EVALSCRIPT_L2A10]
    l20 = [p for p in rec.process
           if p["evalscript"] is acq.EVALSCRIPT_L2A20]
    l40 = [p for p in rec.process
           if p["evalscript"] is acq.EVALSCRIPT_L2A40]
    assert len(l10) == len(l20) == len(l40) == len(raw.s2_dates)
    assert {p["size"] for p in l10} == {(H10, H10)}
    assert {p["size"] for p in l20} == {(H10 // 2, H10 // 2)}
    assert {p["size"] for p in l40} == {(H10 // 4, H10 // 4)}
    for p in l10 + l20 + l40:
        assert p["input"]["mosaicking_order"] == "leastCC"
        start, end = p["input"]["time_interval"]
        delta = dt.date.fromisoformat(end) - dt.date.fromisoformat(start)
        assert delta.days == 2                      # doy +- 1 day
    # per-date intervals cover the selected dates
    doys = sorted(_interval_doy(p["input"]["time_interval"])
                  for p in l10)
    assert doys == sorted(int(d) for d in raw.s2_dates)


def test_data_quality_screen_drops_bad_date(monkeypatch):
    rec = _Recorder()
    _install_fake(monkeypatch, rec, bad_quality_doy=166)   # June 15
    be = acq.SentinelHubBackend(instance_id="fake")
    raw = be.fetch(0, 0, BBOX, YEAR)
    assert 166 not in set(int(d) for d in raw.s2_dates)
    # the screen saw the date; the band requests did not
    dq = [p for p in rec.process
          if p["evalscript"] is acq.EVALSCRIPT_DATA_QUALITY]
    assert 166 in {_interval_doy(p["input"]["time_interval"])
                   for p in dq}
    l10 = [p for p in rec.process
           if p["evalscript"] is acq.EVALSCRIPT_L2A10]
    assert 166 not in {_interval_doy(p["input"]["time_interval"])
                       for p in l10}


def test_s1_orbit_filter_and_quarters(backend):
    be, rec = backend
    be.fetch(0, 0, BBOX, YEAR)
    s1 = [p for p in rec.process
          if p["input"]["collection"] == "SENTINEL1_IW"]
    assert len(s1) == 4                              # one per quarter
    # Africa bbox -> ascending orbit applied to the request payload
    for p in s1:
        assert p["input"]["other_args"]["dataFilter"][
            "orbitDirection"] == "ASCENDING"
    starts = sorted(p["input"]["time_interval"][0] for p in s1)
    assert starts == [f"{YEAR}-01-01", f"{YEAR}-04-01",
                      f"{YEAR}-07-01", f"{YEAR}-10-01"]
    assert {p["size"] for p in s1} == {(H10 // 2, H10 // 2)}


def test_s1_fallback_ladder_on_empty_year(monkeypatch):
    rec = _Recorder()
    _install_fake(monkeypatch, rec, s1_nan_years={YEAR})
    be = acq.SentinelHubBackend(instance_id="fake")
    raw = be.fetch(0, 0, BBOX, YEAR)
    s1_years = [int(p["input"]["time_interval"][0][:4])
                for p in rec.process
                if p["input"]["collection"] == "SENTINEL1_IW"]
    assert YEAR in s1_years and (YEAR - 1) in s1_years
    # ladder landed on a usable year: finite, non-zero wire data
    assert raw.s1.dtype == np.uint16 and np.any(raw.s1 > 0)
