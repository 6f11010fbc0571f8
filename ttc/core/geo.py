"""Geodesy: WGS84 <-> UTM, bounding boxes, tile grid math.

Self-contained replacement for the reference's pyproj usage
(reference: src/downloading/utils.py:21-175). The transverse Mercator
forward/inverse uses the 6th-order Krüger series (same formulation as
pyproj/GeographicLib to sub-millimeter accuracy at UTM scale).
"""
from __future__ import annotations

import math
from typing import Tuple

# WGS84
_A = 6378137.0
_F = 1 / 298.257223563
_K0 = 0.9996
_E2 = _F * (2 - _F)
_N = _F / (2 - _F)

# Krüger series coefficients (6th order in n)
_N1, _N2, _N3, _N4, _N5, _N6 = (_N ** i for i in range(1, 7))
_ALPHA = (
    _N1 / 2 - 2 * _N2 / 3 + 5 * _N3 / 16 + 41 * _N4 / 180 - 127 * _N5 / 288
    + 7891 * _N6 / 37800,
    13 * _N2 / 48 - 3 * _N3 / 5 + 557 * _N4 / 1440 + 281 * _N5 / 630
    - 1983433 * _N6 / 1935360,
    61 * _N3 / 240 - 103 * _N4 / 140 + 15061 * _N5 / 26880
    + 167603 * _N6 / 181440,
    49561 * _N4 / 161280 - 179 * _N5 / 168 + 6601661 * _N6 / 7257600,
    34729 * _N5 / 80640 - 3418889 * _N6 / 1995840,
    212378941 * _N6 / 319334400,
)
_BETA = (
    _N1 / 2 - 2 * _N2 / 3 + 37 * _N3 / 96 - _N4 / 360 - 81 * _N5 / 512
    + 96199 * _N6 / 604800,
    _N2 / 48 + _N3 / 15 - 437 * _N4 / 1440 + 46 * _N5 / 105
    - 1118711 * _N6 / 3870720,
    17 * _N3 / 480 - 37 * _N4 / 840 - 209 * _N5 / 4480 + 5569 * _N6 / 90720,
    4397 * _N4 / 161280 - 11 * _N5 / 504 - 830251 * _N6 / 7257600,
    4583 * _N5 / 161280 - 108847 * _N6 / 3991680,
    20648693 * _N6 / 638668800,
)
# Rectifying radius
_A1 = _A / (1 + _N) * (1 + _N2 / 4 + _N4 / 64 + _N6 / 256)


def utm_epsg(lon: float, lat: float) -> int:
    """UTM EPSG code for a WGS84 lon/lat
    (reference: src/downloading/utils.py:86-103)."""
    band = (math.floor((lon + 180) / 6) % 60) + 1
    return (32600 if lat >= 0 else 32700) + band


def _zone_central_meridian(epsg: int) -> float:
    zone = epsg % 100
    return math.radians(zone * 6 - 183)


def wgs_to_utm(lon: float, lat: float, epsg: int | None = None
               ) -> Tuple[float, float, int]:
    """Forward transverse Mercator: (lon, lat) degrees -> (easting, northing)."""
    if epsg is None:
        epsg = utm_epsg(lon, lat)
    lam0 = _zone_central_meridian(epsg)
    phi = math.radians(lat)
    lam = math.radians(lon) - lam0

    e = math.sqrt(_E2)
    # conformal latitude
    t = math.sinh(
        math.atanh(math.sin(phi)) - e * math.atanh(e * math.sin(phi))
    )
    xi_p = math.atan2(t, math.cos(lam))
    eta_p = math.asinh(math.sin(lam) / math.hypot(t, math.cos(lam)))

    xi = xi_p
    eta = eta_p
    for j, a in enumerate(_ALPHA, start=1):
        xi += a * math.sin(2 * j * xi_p) * math.cosh(2 * j * eta_p)
        eta += a * math.cos(2 * j * xi_p) * math.sinh(2 * j * eta_p)

    easting = _K0 * _A1 * eta + 500000.0
    northing = _K0 * _A1 * xi
    if epsg >= 32700:
        northing += 10000000.0
    return easting, northing, epsg


def utm_to_wgs(easting: float, northing: float, epsg: int
               ) -> Tuple[float, float]:
    """Inverse transverse Mercator: (easting, northing) -> (lon, lat) degrees."""
    lam0 = _zone_central_meridian(epsg)
    if epsg >= 32700:
        northing -= 10000000.0
    xi = northing / (_K0 * _A1)
    eta = (easting - 500000.0) / (_K0 * _A1)

    xi_p = xi
    eta_p = eta
    for j, b in enumerate(_BETA, start=1):
        xi_p -= b * math.sin(2 * j * xi) * math.cosh(2 * j * eta)
        eta_p -= b * math.cos(2 * j * xi) * math.sinh(2 * j * eta)

    e = math.sqrt(_E2)
    chi = math.asin(math.sin(xi_p) / math.cosh(eta_p))
    # invert the conformal latitude by fixed-point iteration:
    # phi = 2*atan(tan(pi/4 + chi/2) * ((1+e sin phi)/(1-e sin phi))^(e/2)) - pi/2
    phi = chi
    base = math.tan(math.pi / 4 + chi / 2)
    for _ in range(12):
        es = e * math.sin(phi)
        phi = 2 * math.atan(base * ((1 + es) / (1 - es)) ** (e / 2)) \
            - math.pi / 2
    lam = math.atan2(math.sinh(eta_p), math.cos(xi_p))
    return math.degrees(lam + lam0), math.degrees(phi)


def make_bbox(initial_bbx, expansion: int = 10):
    """Expand a [min_x, min_y, max_x, max_y] bbox by `expansion` 1/360-degree
    pixels per side (reference: src/download_and_predict_job.py:154-171)."""
    m = 1.0 / 360.0
    return [
        initial_bbx[0] - expansion * m,
        initial_bbx[1] - expansion * m,
        initial_bbx[2] + expansion * m,
        initial_bbx[3] + expansion * m,
    ]


def tile_bbox_utm(coord: Tuple[float, float], step_x: int, step_y: int,
                  expansion: float = 10.0, tile_m: float = 6300.0):
    """Corners [(bottom-left), (top-right)] in UTM of tile (step_x, step_y)
    anchored at `coord` (reference: src/downloading/utils.py:21-58)."""
    e, n, epsg = wgs_to_utm(coord[0], coord[1])
    bl = (e + step_x * tile_m - expansion, n + step_y * tile_m - expansion)
    tr = (e + (step_x + 1) * tile_m + expansion,
          n + (step_y + 1) * tile_m + expansion)
    return (bl, tr), epsg


def bounding_box(point, x_offset_max: int = 140, y_offset_max: int = 140,
                 expansion: int = 10):
    """WGS84 [(min_x, min_y), (max_x, max_y)] of a UTM-offset box around a
    point (reference: src/downloading/utils.py:144-173)."""
    e, n, epsg = wgs_to_utm(point[0], point[1])
    bl = (e - expansion, n - expansion)
    tr = (e + x_offset_max + expansion, n + y_offset_max + expansion)
    min_lon, min_lat = utm_to_wgs(bl[0], bl[1], epsg)
    max_lon, max_lat = utm_to_wgs(tr[0], tr[1], epsg)
    return [(min_lon, min_lat), (max_lon, max_lat)]


def polygon_area(corners) -> float:
    """Shoelace area (reference: src/downloading/utils.py:106-116)."""
    n = len(corners)
    area = 0.0
    for i in range(n):
        j = (i + 1) % n
        area += corners[i][0] * corners[j][1]
        area -= corners[j][0] * corners[i][1]
    return abs(area)
