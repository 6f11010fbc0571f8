"""Acquisition layer: Sentinel-2 / Sentinel-1 / DEM ingestion.

Host-side counterpart of the reference's SentinelHub client
(reference: src/tof/tof_downloading.py). Split into:

- pure numpy screening/packing helpers (testable offline):
  extract_dates, screen_cloud_previews, check_for_alt_img,
  strict uint16 codecs, S1 monthly regrid
- AcquisitionBackend protocol with two implementations:
  SentinelHubBackend (network, gated on the sentinelhub package +
  credentials) and FixtureBackend (synthetic tiles for tests/benchs,
  standing in at the raw-file schema boundary per SURVEY.md §4)
"""
from __future__ import annotations

import dataclasses
import logging
import time
from typing import List, Optional, Protocol, Tuple

import numpy as np

from ttc.core.codecs import to_db
from ttc.ops.regrid import apply_regrid, regrid_weights

log = logging.getLogger("ttc.acquisition")

DAYS_PER_MONTH = [0, 31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30]
MONTH_START_DAYS = np.cumsum(DAYS_PER_MONTH)


def extract_dates(date_list, year: int) -> List[int]:
    """datetime-like list -> integer day-of-year (can be <0 / >365 for
    neighbor years) (reference: tof_downloading.py:38-48)."""
    out = []
    for d in date_list:
        out.append(int((d.year - year) * 365
                       + MONTH_START_DAYS[d.month - 1] + d.day))
    return out


def to_int16_strict(array: np.ndarray) -> np.ndarray:
    """[0,1] float -> uint16 via truncation
    (reference: tof_downloading.py:51-61)."""
    assert array.min() >= 0 and array.max() <= 1
    return np.trunc(np.clip(array, 0, 1) * 65535).astype(np.uint16)


def to_float32_strict(array: np.ndarray) -> np.ndarray:
    if not isinstance(array.flat[0], np.floating):
        assert array.max() > 1
        array = np.float32(array) / 65535.0
    assert array.max() <= 1
    return np.float32(array)


def check_for_alt_img(probs, dates, date) -> bool:
    """True if a >=20%-clearer image exists within the surrounding
    month +-28 days (reference: tof_downloading.py:225-254)."""
    begin = np.array([-60, 31, 59, 90, 120, 151, 181, 212, 243, 273,
                      304, 341])
    end = np.array([31, 59, 90, 120, 151, 181, 212, 243, 273, 304, 341,
                    410])
    begins = end - date
    begins[begins < 0] = 999
    sel = np.argmin(begins)
    lower = min(date - 28, begin[sel])
    upper = max(date + 28, end[sel])
    cand = np.argwhere((dates >= lower) & (dates <= upper)
                       & (dates != date))
    if len(cand) == 0:
        return False
    this_prob = probs[np.argwhere(dates == date).flatten()]
    return bool(np.min(probs[cand]) < (this_prob - 0.20).min())


def screen_cloud_previews(cloud_img: np.ndarray, cloud_dates: np.ndarray,
                          maxclouds: float = 0.4):
    """Date screening from 640 m cloud-probability previews
    (reference: tof_downloading.py:319-448 numpy logic):

    - drop dates whose tile-center 10x10 window is all-nodata
    - global cloud % (nodata-ignored) and local (30x30 center, dilated)
    - drop >50% CC; harmonic-blend local into global when >40%;
      drop > maxclouds; drop locally-cloudy dates with a clear
      same-month alternative

    Returns (cloud_img [0,1], cloud_percent, dates, local_clouds).
    """
    from scipy.ndimage import binary_dilation

    cloud_img = np.float32(cloud_img)
    cloud_dates = np.asarray(cloud_dates)
    mid_x = cloud_img.shape[1] // 2
    mid_y = cloud_img.shape[2] // 2

    center = cloud_img[:, mid_x - 5:mid_x + 5, mid_y - 5:mid_y + 5]
    no_data = np.mean(center == 255, axis=(1, 2))
    # NB: `no_data > 10` on a [0, 1] mean can never fire — replicated
    # verbatim from the reference, where the same dead check ships in
    # production (tof_downloading.py:325-327)
    bad = np.argwhere(no_data > 10).flatten()
    if len(bad):
        cloud_dates = np.delete(cloud_dates, bad)
        cloud_img = np.delete(cloud_img, bad, 0)

    img_nan = cloud_img.copy()
    img_nan[img_nan == 255] = np.nan
    cloud_percent = np.nanmean(img_nan, axis=(1, 2)) / 100

    local = img_nan[:, mid_x - 15:mid_x + 15,
                    mid_y - 15:mid_y + 15].copy() / 100
    for i in range(local.shape[0]):
        local[i] = binary_dilation(local[i])
    local_clouds = np.nanmean(local, axis=(1, 2))

    cloud_img = np.where(np.isnan(img_nan), 255.0, img_nan) / 255.0

    keep = cloud_percent <= 0.5
    cloud_img = cloud_img[keep]
    cloud_percent = cloud_percent[keep]
    cloud_dates = cloud_dates[keep]
    local_clouds = local_clouds[keep]

    high = cloud_percent > 0.4
    cloud_percent[high] = (0.25 * cloud_percent[high]
                           + 0.75 * local_clouds[high])
    keep = cloud_percent <= maxclouds
    cloud_img = cloud_img[keep]
    cloud_percent = cloud_percent[keep]
    cloud_dates = cloud_dates[keep]
    local_clouds = local_clouds[keep]

    to_remove = []
    for idx, (d, lc) in enumerate(zip(cloud_dates, local_clouds)):
        if lc > 0.40 and check_for_alt_img(local_clouds, cloud_dates, d):
            to_remove.append(idx)
    if to_remove:
        cloud_dates = np.delete(cloud_dates, to_remove)
        cloud_img = np.delete(cloud_img, to_remove, 0)
        cloud_percent = np.delete(cloud_percent, to_remove)
        local_clouds = np.delete(local_clouds, to_remove)

    return (cloud_img.astype(np.float32), cloud_percent,
            np.asarray(cloud_dates), local_clouds)


def remove_noise_clouds(arr: np.ndarray) -> np.ndarray:
    """Clear isolated persistent-commission cirrus pixels: a cloudy
    pixel whose 3x3 window holds no other cloud AND that is cloudy in
    more than T-1 dates is noise, not cloud
    (reference: tof_downloading.py:897-910, vectorized — isolated
    centers are mutually non-adjacent, so the reference's sequential
    in-place loop and this parallel form are equivalent)."""
    arr = np.array(arr, copy=True)
    t_total = arr.shape[0]
    cloudy = (arr > 0).astype(np.int32)
    persistent = np.sum(cloudy, axis=0) > (t_total - 1)       # (H, W)
    win = np.zeros_like(cloudy)
    win[:, 1:-1, 1:-1] = sum(
        cloudy[:, 1 + dx:arr.shape[1] - 1 + dx,
               1 + dy:arr.shape[2] - 1 + dy]
        for dx in (-1, 0, 1) for dy in (-1, 0, 1))
    isolated = (cloudy > 0) & (win <= 1)
    isolated[:, 0, :] = isolated[:, -1, :] = False
    isolated[:, :, 0] = isolated[:, :, -1] = False
    clear = isolated & persistent[None]
    arr[clear] = 0
    return arr


def screen_data_quality(quality_img: np.ndarray,
                        threshold: float = 0.2) -> np.ndarray:
    """Indices of dates failing the 160 m DATA_QUALITY screen (AOT /
    sun-zenith / view-zenith flags, uint8 255 = bad): drop dates with
    more than `threshold` bad fraction
    (reference: tof_downloading.py:1006-1019)."""
    quality_per_img = np.mean(np.float32(quality_img), axis=(1, 2)) / 255
    return np.argwhere(quality_per_img > threshold).flatten()


def _nearest_resize(arr: np.ndarray, h: int, w: int) -> np.ndarray:
    """Nearest-neighbor spatial resize of (T, H, W, C)."""
    ih = (np.arange(h) * arr.shape[1] / h).astype(np.int64)
    iw = (np.arange(w) * arr.shape[2] / w).astype(np.int64)
    return arr[:, ih][:, :, iw]


def reconcile_40m(img_40: np.ndarray, target_h: int,
                  target_w: int) -> np.ndarray:
    """Upsample the 40 m band group 2x and reconcile odd-shape
    mismatches against the 20 m grid: nearest-resize when smaller,
    2-px center trim, or 1-px repeat-trim-average
    (reference: tof_downloading.py:1055-1088)."""
    img_40 = img_40.repeat(2, axis=1).repeat(2, axis=2)

    if (target_h > img_40.shape[1]) or (target_w > img_40.shape[2]):
        img_40 = _nearest_resize(img_40, target_h, target_w)

    if img_40.shape[1] > target_h:
        to_remove = img_40.shape[1] - target_h
        if to_remove == 2:
            img_40 = img_40[:, 1:-1]
        if to_remove == 1:
            img_40 = img_40.repeat(2, axis=1).repeat(2, axis=2)
            img_40 = img_40[:, 1:-1]
            img_40 = img_40.reshape(
                img_40.shape[0], img_40.shape[1] // 2, 2,
                img_40.shape[2] // 2, 2, img_40.shape[-1])
            img_40 = np.mean(img_40, axis=(2, 4))

    if img_40.shape[2] > target_w:
        to_remove = img_40.shape[2] - target_w
        if to_remove == 2:
            img_40 = img_40[:, :, 1:-1]
        if to_remove == 1:
            img_40 = img_40.repeat(2, axis=1).repeat(2, axis=2)
            img_40 = img_40[:, :, 1:-1]
            img_40 = img_40.reshape(
                img_40.shape[0], img_40.shape[1] // 2, 2,
                img_40.shape[2] // 2, 2, img_40.shape[-1])
            img_40 = np.mean(img_40, axis=(2, 4))
    return img_40


def identify_s1_orbit(lat: float, lon: float) -> str:
    """Ascending/descending S1 orbit per continent/latitude, from the
    Sentinel-1 observation-scenario coverage. The reference reverse-
    geocodes to a continent code (tof_downloading.py:720-757, SENT =
    ascending, SENT_DESC = descending); this uses coarse lon/lat
    continent boxes instead of the geocoder dependency."""
    if -20 <= lon <= 55 and -35 <= lat <= 38:       # Africa
        return "ASCENDING"
    if 110 <= lon <= 180 and -50 <= lat <= 0:       # Oceania
        return "ASCENDING"
    if -82 <= lon <= -34 and -56 <= lat <= 13:      # South America
        return "ASCENDING" if lat > -7.11 else "DESCENDING"
    if 55 < lon <= 180 and 0 <= lat <= 55:          # Asia
        return "ASCENDING" if lat > 23.3 else "DESCENDING"
    if -170 <= lon <= -50 and 13 < lat <= 72:       # N/C America
        return "DESCENDING"
    return "ASCENDING"


def s1_fallback_plan(year: int, orbit: str):
    """The reference's S1 acquisition ladder: per year (this year, then
    up to 4 years back, then up to 2 forward) try the chosen orbit, the
    opposite orbit, then both
    (reference: download_and_predict_job.py:425-459)."""
    other = "DESCENDING" if orbit == "ASCENDING" else "ASCENDING"
    for y in (year, year - 1, year - 2, year - 3, year - 4,
              year + 1, year + 2):
        yield y, orbit
        yield y, other
        yield y, "ALL"


def reject_nan_quarters(s1_quarters: np.ndarray) -> np.ndarray:
    """Valid-quarter mask: a quarterly composite that is entirely
    nodata (NaN or 0) is rejected
    (reference: tof_downloading.py:667-682 nan-quarter rejection)."""
    flat = s1_quarters.reshape(s1_quarters.shape[0], -1)
    all_bad = np.all(~np.isfinite(flat) | (flat == 0), axis=1)
    return ~all_bad


def s1_quarterly_to_monthly(s1_quarters: np.ndarray,
                            dates: np.ndarray) -> np.ndarray:
    """(Q, H, W, 2) quarterly composites -> (12, H, W, 2) pseudo-monthly
    medians via the biweekly regrid (reference:
    tof_downloading.py:75-95)."""
    weights, _ = regrid_weights(dates)
    s24 = np.asarray(apply_regrid(s1_quarters.astype(np.float32),
                                  weights))
    monthly = np.zeros((12,) + s1_quarters.shape[1:], np.float32)
    for m, (start, end) in enumerate(zip(range(0, 24, 2),
                                         range(2, 26, 2))):
        monthly[m] = np.median(s24[start:end], axis=0)
    return monthly


# ------------------------------------------------------------- backends

@dataclasses.dataclass
class RawTile:
    """The raw-file schema boundary: everything process_tile consumes
    (reference: download_and_predict_job.py:466-635 outputs)."""

    s2_10: np.ndarray          # (T, H, W, 4) uint16
    s2_20: np.ndarray          # (T, H/2, W/2, 6) uint16
    s2_dates: np.ndarray       # (T,) int day-of-year
    clouds: np.ndarray         # (T, h, w) float [0,1] preview probs
    s1: np.ndarray             # preferred wire format: (4, H, W, 2)
                               # uint16 LINEAR quarterly composites
                               # (dB + monthly expansion happen on
                               # device, ttc.preprocess.ard._ingest);
                               # legacy (12, H, W, 2) float32 monthly
                               # dB is still accepted
    s1_dates: np.ndarray       # (4,) quarter day-of-year (legacy: 12)
    dem: np.ndarray            # (H, W) float32 SLOPE in degrees — the
                               # reference computes slope at download
                               # time (tof_downloading.py:451-495) and
                               # the raw dem_{tile}.hkl stores it
    cirrus: Optional[np.ndarray] = None   # (T, h, w) 160 m denoised
                               # cirrus flags (tof_downloading.py:994-
                               # 1003); None for backends without it


class AcquisitionBackend(Protocol):
    def fetch(self, tile_x: int, tile_y: int, bbox, year: int) -> RawTile:
        ...


class FixtureBackend:
    """Synthetic acquisition: reproducible vegetated scenes with
    seasonal phenology, speckled S1, hilly DEM, and planted clouds."""

    def __init__(self, seed: int = 0, n_dates: int = 10, hw: int = 158,
                 cloud_fraction: float = 0.15):
        self.seed = seed
        self.n_dates = n_dates
        self.hw = hw
        self.cloud_fraction = cloud_fraction

    def fetch(self, tile_x: int, tile_y: int, bbox, year: int) -> RawTile:
        rng = np.random.default_rng(
            self.seed * 7919 + tile_x * 31 + tile_y)
        t, hw = self.n_dates, self.hw
        dates = np.sort(rng.choice(np.arange(5, 360), t, replace=False))

        base = rng.random((hw, hw)) * 0.05
        season = 0.5 + 0.5 * np.sin(2 * np.pi * dates / 365.0)
        s2 = np.zeros((t, hw, hw, 10), np.float32)
        for i in range(t):
            green = 0.25 + 0.1 * season[i]
            s2[i, ..., 0] = 0.02 + base
            s2[i, ..., 1] = 0.04 + base
            s2[i, ..., 2] = 0.03 + base
            s2[i, ..., 3] = green + base
            s2[i, ..., 4:8] = 0.2 + 0.05 * season[i]
            s2[i, ..., 7] = green * 0.9 + base
            s2[i, ..., 8] = 0.12 + base
            s2[i, ..., 9] = 0.07 + base / 2
        s2 += rng.normal(0, 0.003, s2.shape).astype(np.float32)

        clouds_prev = np.zeros((t, 28, 28), np.float32)
        for i in range(t):
            if rng.random() < self.cloud_fraction * 2:
                cx, cy = rng.integers(4, hw - 40, 2)
                sz = int(rng.integers(15, 45))
                s2[i, cx:cx + sz, cy:cy + sz, :3] += 0.3
                s2[i, cx:cx + sz, cy:cy + sz, 3:] += 0.15
                clouds_prev[i, cx * 28 // hw:(cx + sz) * 28 // hw,
                            cy * 28 // hw:(cy + sz) * 28 // hw] = 80.0
        s2 = np.clip(s2, 0.01, 0.99)

        q_dates = np.array([45, 136, 227, 318])
        s1_lin = np.clip(
            rng.gamma(4.0, 0.02, (4, hw, hw, 2)), 1e-4, 1.0)

        # synthetic elevation -> slope degrees, like the reference's
        # download-time calcSlope (10 m pixels, min slope 0.02)
        import jax.numpy as jnp

        from ttc.ops.slope import calc_slope

        elev = (300 + 80 * np.sin(np.linspace(0, 4, hw + 2))[:, None]
                + rng.normal(0, 2, (hw + 2, hw + 2))).astype(np.float32)
        dem = np.asarray(calc_slope(jnp.asarray(elev), 10.0, 10.0,
                                    min_slope=0.02))[1:-1, 1:-1]

        return RawTile(
            s2_10=to_int16_strict(s2[..., :4]),
            s2_20=to_int16_strict(
                s2[:, ::2, ::2, 4:]),
            s2_dates=dates,
            clouds=clouds_prev / 100.0,
            s1=to_int16_strict(s1_lin),
            s1_dates=q_dates,
            dem=dem,
        )


# SentinelHub evalscript equivalents (server-side mosaicking config).
# These reproduce the behavior of the reference's configured layers:
# darkest-pixel orbit mosaics per band group, CLP-threshold cloud
# preview, AOT/zenith data-quality, and cirrus screens
# (reference: README.md:131-399).
EVALSCRIPT_L2A10 = """//VERSION=3
function setup() {
  return {input: [{bands: ["B02","B03","B04","B08"], units: "DN"}],
          output: {bands: 4, sampleType: "UINT16"},
          mosaicking: "ORBIT"};
}
function evaluatePixel(samples) {
  var best = null, darkest = 1e9;
  for (var i = 0; i < samples.length; i++) {
    var s = samples[i];
    var b = s.B02 + s.B03 + s.B04;
    if (b > 0 && b < darkest) { darkest = b; best = s; }
  }
  if (best === null) best = samples[0];
  return [best.B02, best.B03, best.B04, best.B08];
}
"""

EVALSCRIPT_L2A20 = """//VERSION=3
function setup() {
  return {input: [{bands: ["B05","B06","B07","B8A"], units: "DN"}],
          output: {bands: 4, sampleType: "UINT16"},
          mosaicking: "ORBIT"};
}
function evaluatePixel(samples) {
  var best = null, darkest = 1e9;
  for (var i = 0; i < samples.length; i++) {
    var s = samples[i];
    var b = s.B05 + s.B06 + s.B07;
    if (b > 0 && b < darkest) { darkest = b; best = s; }
  }
  if (best === null) best = samples[0];
  return [best.B05, best.B06, best.B07, best.B8A];
}
"""

EVALSCRIPT_L2A40 = """//VERSION=3
function setup() {
  return {input: [{bands: ["B11","B12"], units: "DN"}],
          output: {bands: 2, sampleType: "UINT16"},
          mosaicking: "ORBIT"};
}
function evaluatePixel(samples) {
  var best = null, darkest = 1e9;
  for (var i = 0; i < samples.length; i++) {
    var s = samples[i];
    var b = s.B11 + s.B12;
    if (b > 0 && b < darkest) { darkest = b; best = s; }
  }
  if (best === null) best = samples[0];
  return [best.B11, best.B12];
}
"""

EVALSCRIPT_CLOUD_PREVIEW = """//VERSION=3
function setup() {
  return {input: [{bands: ["CLP", "dataMask"]}],
          output: {bands: 1, sampleType: "UINT8"}};
}
function evaluatePixel(sample) {
  if (sample.dataMask === 0) return [255];
  return [Math.round(100 * (sample.CLP / 255 > 0.67 ? 1 : 0))];
}
"""

# 160 m AOT / zenith data-quality flags (reference README.md:321-355)
EVALSCRIPT_DATA_QUALITY = """//VERSION=3
function setup() {
  return {input: [{bands: ["dataMask", "viewZenithMean",
                           "sunZenithAngles", "AOT"]}],
          output: {bands: 1, sampleType: "UINT8"},
          mosaicking: "ORBIT"};
}
function evaluatePixel(samples) {
  var s = samples[0];
  if (s.dataMask == 0) return [255];
  if (s.AOT > 0.6) return [255];
  if (s.sunZenithAngles < 13) return [255];
  if (s.viewZenithMean > 12) return [255];
  return [0];
}
"""

# 160 m darkest-pixel cirrus flags (reference README.md:358-399)
EVALSCRIPT_CIRRUS = """//VERSION=3
function setup() {
  return {input: [{bands: ["B02", "CLP", "dataMask"]}],
          output: {bands: 1, sampleType: "UINT16"},
          mosaicking: "ORBIT"};
}
function evaluatePixel(samples) {
  var b02 = 1, scl = 0;
  for (var i = 0; i < samples.length; i++) {
    var s = samples[i];
    if (s.dataMask == 1 && s.B02 < b02) {
      b02 = s.B02;
      if (s.CLP > (255 * 0.67)) { scl = 2; }
    }
  }
  return [scl];
}
"""

EVALSCRIPT_S1 = """//VERSION=3
function setup() {
  return {input: [{bands: ["VV", "VH"]}],
          output: {bands: 2, sampleType: "FLOAT32"},
          mosaicking: "ORBIT"};
}
function evaluatePixel(samples) {
  var vv = 0, vh = 0, n = 0;
  for (var i = 0; i < samples.length; i++) {
    if (samples[i].VV > 0) { vv += samples[i].VV; vh += samples[i].VH; n++; }
  }
  if (n === 0) return [0, 0];
  return [vv / n, vh / n];
}
"""


class RequestBudget:
    """Processing-unit accounting across a job's requests, mirroring
    the reference's per-request PU prints (reference:
    tof_downloading.py:691-699): PU ~= (4/3) * T * (H*W / 512^2)."""

    def __init__(self):
        self.total_pu = 0.0
        self.n_requests = 0

    def charge(self, n_dates: int, height: int, width: int,
               label: str = "") -> float:
        pu = (4.0 / 3.0) * max(int(n_dates), 1) \
            * (height * width) / (512 * 512)
        self.total_pu += pu
        self.n_requests += 1
        log.info("request %d (%s): %.1f PU (total %.1f over %d "
                 "requests)", self.n_requests, label or "-", pu,
                 self.total_pu, self.n_requests)
        return pu


def with_retries(fn, max_attempts: int = 4, base_wait: float = 10.0,
                 sleep=time.sleep):
    """Run fn() with exponential backoff on transient failures — the
    reference's per-tile sleep-and-retry containment
    (download_and_predict_job.py:2079-2091) applied at the request
    level. Re-raises after max_attempts."""
    for attempt in range(max_attempts):
        try:
            return fn()
        except KeyboardInterrupt:
            raise
        except Exception:
            if attempt == max_attempts - 1:
                raise
            wait = base_wait * (2 ** attempt)
            log.warning("request failed (attempt %d/%d), retrying in "
                        "%.0f s", attempt + 1, max_attempts, wait,
                        exc_info=True)
            sleep(wait)


class SentinelHubBackend:
    """Live SentinelHub acquisition. Requires the `sentinelhub` package
    and credentials — both gated; constructing without them raises a
    clear error. Mirrors the request structure of the reference
    (reference: tof_downloading.py:257-448,527-714,913-1140):
    640 m cloud previews over a 15x bbox for date screening, per-band-
    group Process API requests with darkest-pixel orbit mosaicking,
    quarterly S1 GRD composites, and download-time DEM slope. Every
    request runs through retry-with-backoff and processing-unit
    accounting (tof_downloading.py:691-699)."""

    def __init__(self, instance_id: str = "", client_id: str = "",
                 client_secret: str = "", maxclouds: float = 0.4,
                 max_attempts: int = 4):
        try:
            import sentinelhub  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "SentinelHubBackend requires the sentinelhub package; "
                "use FixtureBackend for offline work") from e
        from sentinelhub import SHConfig

        cfg = SHConfig()
        if instance_id:
            cfg.instance_id = instance_id
        if client_id:
            cfg.sh_client_id = client_id
            cfg.sh_client_secret = client_secret
        self.config = cfg
        self.maxclouds = maxclouds
        self.max_attempts = max_attempts
        self.budget = RequestBudget()

    def _process_request(self, evalscript, bbox, time_interval, size,
                         collection_name="SENTINEL2_L2A",
                         mosaicking_order=None, orbit=None):
        from sentinelhub import (
            BBox, CRS, DataCollection, MimeType, SentinelHubRequest,
        )

        collection = getattr(DataCollection, collection_name)
        input_kwargs = {"time_interval": time_interval}
        if mosaicking_order:
            input_kwargs["mosaicking_order"] = mosaicking_order
        if orbit and orbit != "ALL":
            # apply the chosen S1 orbit to the request itself
            # (reference layers SENT / SENT_DESC,
            # tof_downloading.py:720-757)
            input_kwargs["other_args"] = {
                "dataFilter": {"orbitDirection": orbit}}
        request = SentinelHubRequest(
            evalscript=evalscript,
            input_data=[SentinelHubRequest.input_data(
                data_collection=collection, **input_kwargs)],
            responses=[SentinelHubRequest.output_response(
                "default", MimeType.TIFF)],
            bbox=BBox(list(bbox), crs=CRS.WGS84),
            size=size,
            config=self.config)
        data = np.asarray(with_retries(request.get_data,
                                       self.max_attempts))
        self.budget.charge(data.shape[0] if data.ndim == 4 else 1,
                           size[1], size[0], collection_name)
        return data

    def fetch(self, tile_x: int, tile_y: int, bbox, year: int) -> RawTile:
        """bbox: (min_lon, min_lat, max_lon, max_lat) of the 6x6 km
        tile; the cloud-preview bbox is expanded 15x for cross-tile
        date consistency (reference: download_and_predict_job.py:497-499)."""
        from ttc.core.geo import make_bbox

        span = (f"{year - 1}-11-15", f"{year + 1}-02-15")
        big_bbox = make_bbox(list(bbox), expansion=300 * 15 // 10)

        # 1. date screening from 640 m cloud previews
        previews, dates = self._get_cloud_previews(big_bbox, span, year)
        cloud_img, cloud_pct, dates, local = screen_cloud_previews(
            previews, dates, self.maxclouds)
        from ttc.preprocess.dates import select_sunny_dates

        to_rm = select_sunny_dates(dates, cloud_pct)
        keep = np.setdiff1d(np.arange(len(dates)), to_rm)
        dates = dates[keep]
        cloud_img = cloud_img[keep]

        h10 = int(round((bbox[3] - bbox[1]) * 360 * 10))
        h160 = max(h10 // 16, 4)

        # 2a. 160 m DATA_QUALITY screen: drop >20%-bad dates
        # (reference: tof_downloading.py:1006-1019)
        quality = np.stack([
            self._process_request(
                EVALSCRIPT_DATA_QUALITY, bbox,
                _doy_interval(year, int(d)), (h160, h160))[0][..., 0]
            for d in dates])
        bad = screen_data_quality(quality)
        if len(bad):
            keep = np.setdiff1d(np.arange(len(dates)), bad)
            dates = dates[keep]
            cloud_img = cloud_img[keep]

        # 2b. 160 m cirrus layer, denoised (reference :897-910,994-1003)
        cirrus = np.stack([
            self._process_request(
                EVALSCRIPT_CIRRUS, bbox,
                _doy_interval(year, int(d)), (h160, h160))[0][..., 0]
            for d in dates]).astype(np.float32)
        cirrus = (remove_noise_clouds(cirrus) > 0).astype(np.float32)

        # 2c. per-date S2 band groups (10 m, 20 m, 40 m reconciled)
        s2_10 = []
        s2_20 = []
        for d in dates:
            window = _doy_interval(year, int(d))
            img10 = self._process_request(
                EVALSCRIPT_L2A10, bbox, window, (h10, h10),
                mosaicking_order="leastCC")[0]
            img20a = self._process_request(
                EVALSCRIPT_L2A20, bbox, window, (h10 // 2, h10 // 2),
                mosaicking_order="leastCC")[0]
            img40 = self._process_request(
                EVALSCRIPT_L2A40, bbox, window, (h10 // 4, h10 // 4),
                mosaicking_order="leastCC")[0]
            img40 = reconcile_40m(img40[None], img20a.shape[0],
                                  img20a.shape[1])[0]
            s2_10.append(img10)
            s2_20.append(np.concatenate([img20a, img40], axis=-1))
        s2_10 = np.stack(s2_10)
        s2_20 = np.stack(s2_20)

        # 3. quarterly S1 composites -> monthly dB, with the orbit
        # choice applied to requests and the year/orbit fallback ladder
        # (reference: download_and_predict_job.py:425-459)
        q_dates = np.array([45, 136, 227, 318])
        lat = (bbox[1] + bbox[3]) / 2
        lon = (bbox[0] + bbox[2]) / 2
        orbit = identify_s1_orbit(lat, lon)
        s1_q = None
        for try_year, try_orbit in s1_fallback_plan(year, orbit):
            quarters = []
            for qi in range(4):
                start = f"{try_year}-{1 + qi * 3:02d}-01"
                end = f"{try_year}-{3 + qi * 3:02d}-28"
                arr = self._process_request(
                    EVALSCRIPT_S1, bbox, (start, end),
                    (h10 // 2, h10 // 2),
                    collection_name="SENTINEL1_IW",
                    orbit=try_orbit)[0]
                quarters.append(
                    np.repeat(np.repeat(arr, 2, 0), 2, 1)[:h10, :h10])
            quarters = np.stack(quarters)
            valid = reject_nan_quarters(quarters)
            if valid.any():
                # repeat nearest valid quarter into rejected slots
                idx = np.arange(4)
                good = idx[valid]
                fill = good[np.argmin(
                    np.abs(idx[:, None] - good[None]), axis=1)]
                s1_q = quarters[fill]
                break
        if s1_q is None:
            raise RuntimeError("no Sentinel-1 imagery found across the "
                               "orbit/year fallback ladder")
        s1_lin = np.clip(np.nan_to_num(s1_q, nan=0.0), 1e-5, 1.0)
        # quarterly uint16 linear on the wire; dB conversion and the
        # 12-step monthly expansion happen on device (_ingest)

        # 4. DEM -> slope at download time (reference :451-495)
        import jax.numpy as jnp

        from ttc.ops.slope import calc_slope

        dem_raw = self._process_request(
            EVALSCRIPT_DEM, make_bbox(list(bbox), 1), span,
            (h10 + 2, h10 + 2), collection_name="DEM_COPERNICUS_30")[0]
        elev = dem_raw.astype(np.float32).squeeze() - 12000.0
        slope = np.asarray(calc_slope(jnp.asarray(elev), 10.0, 10.0,
                                      min_slope=0.02))[1:-1, 1:-1]

        return RawTile(
            s2_10=s2_10.astype(np.uint16),
            s2_20=s2_20.astype(np.uint16),
            s2_dates=np.asarray(dates),
            clouds=cloud_img,
            s1=to_int16_strict(s1_lin),
            s1_dates=q_dates,
            dem=slope,
            cirrus=cirrus,
        )

    def _get_cloud_previews(self, big_bbox, span, year):
        from sentinelhub import BBox, CRS, DataCollection, MimeType, WcsRequest

        import datetime as _dt

        request = WcsRequest(
            data_collection=DataCollection.SENTINEL2_L2A,
            layer="CLOUD_SCL_PREVIEW",
            bbox=BBox(list(big_bbox), crs=CRS.WGS84),
            time=span, resx="640m", resy="640m",
            image_format=MimeType.TIFF, maxcc=0.5,
            config=self.config,
            time_difference=_dt.timedelta(hours=48))
        dates = extract_dates(list(request.get_dates()), year)
        imgs = np.asarray(request.get_data()).astype(np.float32)
        return imgs, np.asarray(dates)


def _doy_interval(year: int, doy: int):
    import datetime as _dt

    base = _dt.date(year, 1, 1) + _dt.timedelta(days=int(doy) - 1)
    return (str(base - _dt.timedelta(days=1)),
            str(base + _dt.timedelta(days=1)))


EVALSCRIPT_DEM = """//VERSION=3
function setup() {
  return {input: [{bands: ["DEM"]}],
          output: {bands: 1, sampleType: "UINT16"}};
}
function evaluatePixel(sample) {
  return [sample.DEM + 12000];
}
"""


# (identify_s1_orbit lives with the other acquisition screens above.)
