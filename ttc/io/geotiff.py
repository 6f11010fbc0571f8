"""Minimal GeoTIFF codec (writer + reader), no GDAL/rasterio required.

Writes single- or multi-band uint8/uint16/int16/float32 rasters with
deflate compression, WGS84 georeferencing from a (min_x, min_y, max_x,
max_y) bounding box — the counterpart of the reference's rasterio-based
write_tif (reference: src/downloading/io.py:229-263,
src/download_and_predict_job.py:183-257). The reader handles the files
this writer produces (strip-based, deflate or uncompressed) for
round-trip tests and downstream jobs.
"""
from __future__ import annotations

import struct
import zlib

import numpy as np

_DTYPES = {
    np.dtype(np.uint8): (8, 1),     # bits, sample_format (1=unsigned)
    np.dtype(np.uint16): (16, 1),
    np.dtype(np.int16): (16, 2),
    np.dtype(np.float32): (32, 3),
}
_REV = {(8, 1): np.uint8, (16, 1): np.uint16, (16, 2): np.int16,
        (32, 3): np.float32}

_II = b"II"  # little endian


def _tag(code, ttype, count, value):
    return (code, ttype, count, value)


def write_geotiff(path: str, arr: np.ndarray, bbox, nodata=None,
                  compress: bool = True):
    """arr: (H, W) or (H, W, C); bbox: (min_x, min_y, max_x, max_y) in
    WGS84 degrees. North-up raster: row 0 = max_y."""
    if arr.ndim == 2:
        arr = arr[..., None]
    h, w, c = arr.shape
    dt = np.dtype(arr.dtype)
    if dt not in _DTYPES:
        raise ValueError(f"unsupported dtype {dt}")
    bits, fmt = _DTYPES[dt]

    raw = np.ascontiguousarray(arr).tobytes()
    data = zlib.compress(raw, 6) if compress else raw

    min_x, min_y, max_x, max_y = bbox
    sx = (max_x - min_x) / w
    sy = (max_y - min_y) / h

    # ---- assemble IFD
    # out-of-line payloads placed after the IFD
    entries = []
    extra = b""
    header_size = 8
    # IFD begins right after header; count computed later
    def _off_extra():
        return header_size + 2 + len(entries_bin) * 12 + 4 + len(extra)

    # build in two passes: first compute sizes with placeholders
    n_entries = 15 if nodata is not None else 14
    ifd_start = 8
    data_offset_pos = None

    # payload area offsets
    payload_base = ifd_start + 2 + n_entries * 12 + 4

    payloads = {}

    def add_payload(key, blob, align=2):
        nonlocal extra
        off = payload_base + len(extra)
        if off % align:
            extra += b"\x00" * (align - off % align)
            off = payload_base + len(extra)
        extra += blob
        payloads[key] = off
        return off

    bps_val = None
    if c <= 2:
        packed = 0
        for i in range(c):
            packed |= bits << (16 * i)
        bps_val = packed if c == 2 else bits
    else:
        bps_blob = struct.pack(f"<{c}H", *([bits] * c))
        bps_val = add_payload("bps", bps_blob)
    sfmt_val = None
    if c <= 2:
        packed = 0
        for i in range(c):
            packed |= fmt << (16 * i)
        sfmt_val = packed if c == 2 else fmt
    else:
        sfmt_val = add_payload("sfmt",
                               struct.pack(f"<{c}H", *([fmt] * c)))

    scale_off = add_payload(
        "scale", struct.pack("<3d", sx, sy, 0.0), align=8)
    tie_off = add_payload(
        "tie", struct.pack("<6d", 0, 0, 0, min_x, max_y, 0), align=8)
    # GeoKeys: GTModelType=2 (geographic), GTRasterType=1 (pixel-is-area),
    # GeographicType=4326
    geokeys = struct.pack("<16H", 1, 1, 0, 3,
                          1024, 0, 1, 2,
                          1025, 0, 1, 1,
                          2048, 0, 1, 4326)
    geo_off = add_payload("geo", geokeys)
    nodata_off = None
    if nodata is not None:
        blob = str(nodata).encode() + b"\x00"
        nodata_off = add_payload("nodata", blob)
        nodata_len = len(blob)

    data_off = payload_base + len(extra)

    tags = [
        (256, 3, 1, w),
        (257, 3, 1, h),
        (258, 3, c, bps_val),
        (259, 3, 1, 8 if compress else 1),
        (262, 3, 1, 1),
        (273, 4, 1, data_off),
        (277, 3, 1, c),
        (278, 3, 1, h),
        (279, 4, 1, len(data)),
        (284, 3, 1, 1),
        (339, 3, c, sfmt_val),
        (33550, 12, 3, scale_off),
        (33922, 12, 6, tie_off),
        (34735, 3, 16, geo_off),
    ]
    if nodata is not None:
        tags.append((42113, 2, nodata_len, nodata_off))
    tags.sort(key=lambda t: t[0])
    assert len(tags) == n_entries

    entries_bin = b"".join(
        struct.pack("<HHI4s", code, ttype, count,
                    struct.pack("<I", value)[:4])
        for code, ttype, count, value in tags)

    with open(path, "wb") as f:
        f.write(_II + struct.pack("<HI", 42, ifd_start))
        f.write(struct.pack("<H", n_entries))
        f.write(entries_bin)
        f.write(struct.pack("<I", 0))  # next IFD
        f.write(extra)
        f.write(data)
    return path


def read_geotiff(path: str):
    """Read a strip-based TIFF produced by write_geotiff (or similar).
    Returns (array (H, W, C), bbox)."""
    with open(path, "rb") as f:
        blob = f.read()
    if blob[:2] != _II:
        raise ValueError("only little-endian TIFF supported")
    ifd_off = struct.unpack_from("<I", blob, 4)[0]
    n = struct.unpack_from("<H", blob, ifd_off)[0]
    tags = {}
    for i in range(n):
        code, ttype, count, raw = struct.unpack_from(
            "<HHI4s", blob, ifd_off + 2 + i * 12)
        tags[code] = (ttype, count, raw)

    def tag_values(code, default=None):
        if code not in tags:
            return default
        ttype, count, raw = tags[code]
        size = {1: 1, 2: 1, 3: 2, 4: 4, 12: 8}[ttype]
        fmt = {1: "B", 2: "c", 3: "H", 4: "I", 12: "d"}[ttype]
        total = size * count
        if total <= 4:
            buf = raw[:total]
        else:
            off = struct.unpack("<I", raw)[0]
            buf = blob[off:off + total]
        vals = struct.unpack(f"<{count}{fmt}", buf)
        return list(vals)

    w = tag_values(256)[0]
    h = tag_values(257)[0]
    c = tag_values(277, [1])[0]
    bits = tag_values(258)[0]
    comp = tag_values(259, [1])[0]
    sfmt = tag_values(339, [1])[0]
    offs = tag_values(273)
    cnts = tag_values(279)
    rows_per_strip = tag_values(278, [h])[0]

    dt = np.dtype(_REV[(bits, sfmt)])
    out = np.empty((h, w, c), dt)
    row = 0
    for off, cnt in zip(offs, cnts):
        chunk = blob[off:off + cnt]
        if comp == 8:
            chunk = zlib.decompress(chunk)
        elif comp != 1:
            raise ValueError(f"unsupported compression {comp}")
        n_rows = min(rows_per_strip, h - row)
        strip = np.frombuffer(chunk, dt).reshape(n_rows, w, c)
        out[row:row + n_rows] = strip
        row += n_rows

    scale = tag_values(33550)
    tie = tag_values(33922)
    bbox = None
    if scale and tie:
        sx, sy = scale[0], scale[1]
        min_x = tie[3]
        max_y = tie[4]
        bbox = (min_x, max_y - sy * h, min_x + sx * w, max_y)
    return out, bbox


def write_tree_cover_tif(path: str, preds: np.ndarray, bbox):
    """uint8 0-100 tree cover raster with 255 nodata, matching the
    reference's output product (reference: src/downloading/io.py:229-263)."""
    return write_geotiff(path, preds.astype(np.uint8), bbox, nodata=255)
