"""On-disk / on-wire codecs for raster arrays.

All raw imagery is stored as uint16 with reflectance scaled by 65535
(reference: src/tof/tof_downloading.py:51-72); Sentinel-1 backscatter is
converted to clipped dB and rescaled to [0, 1]
(reference: src/download_and_predict_job.py:74-89). NDMI change-detection
stacks are stored as int16 scaled by 10000 and quantized to steps of 5
(reference: src/download_and_predict_job.py:1162).

These are tiny elementwise ops; they are written so they work identically
on numpy arrays (host IO path) and jax arrays (device path).
"""
from __future__ import annotations

import numpy as np


def to_uint16(arr):
    """Encode [0, 1] float reflectance to uint16 x 65535."""
    xp = np if isinstance(arr, np.ndarray) else _jnp()
    arr = xp.clip(arr, 0.0, 1.0)
    return xp.rint(arr * 65535).astype(xp.uint16)


def from_uint16(arr):
    """Decode uint16 x 65535 to float32 [0, 1]."""
    xp = np if isinstance(arr, np.ndarray) else _jnp()
    return (arr / 65535.0).astype(xp.float32)


def to_db(x, min_db: int = 22):
    """Sentinel-1 unitless backscatter -> clipped dB rescaled to [0, 1].

    Matches convert_to_db (reference: src/download_and_predict_job.py:74-89):
    10*log10(x + 1/65535) floored at -min_db, then (x+min_db)/min_db.
    """
    xp = np if isinstance(x, np.ndarray) else _jnp()
    x = 10.0 * xp.log10(x + 1.0 / 65535.0)
    x = xp.where(x < -min_db, -float(min_db), x)
    x = (x + min_db) / min_db
    return xp.clip(x, 0.0, 1.0)


def ndmi_to_int16(ndmi):
    """NDMI float -> int16 x 10000, quantized to steps of 5."""
    xp = np if isinstance(ndmi, np.ndarray) else _jnp()
    return (xp.clip(ndmi * 10000, -32000, 32000).astype(xp.int16) // 5) * 5


def float_to_int16(arr, precision: int = 1000):
    """Feature-map codec: float -> int16 x precision, NaN -> -32768."""
    arr = np.asarray(arr, dtype=np.float32).copy()
    arr[np.isnan(arr)] = -32768 / precision
    arr = np.clip(arr, -32768 / precision, 32767 / precision)
    return np.int16(arr * precision)


def _jnp():
    import jax.numpy as jnp

    return jnp
