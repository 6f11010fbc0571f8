"""Spectral indices (EVI, BI, MSAVI2, GRNDVI, NDMI) as jittable ops.

Formulas and clip ranges match the reference
(reference: src/preprocessing/indices.py:4-54,
src/download_and_predict_job.py:91-92). Band axis layout: the first ten
channels are B02, B03, B04, B08, B05, B06, B07, B8A, B11, B12.
"""
from __future__ import annotations

import jax.numpy as jnp


def evi(x):
    blue = jnp.clip(x[..., 0], 0.0, 1.0)
    red = jnp.clip(x[..., 2], 0.0, 1.0)
    nir = jnp.clip(x[..., 3], 0.0, 1.0)
    out = 2.5 * ((nir - red) / (nir + 6.0 * red - 7.5 * blue + 1.0))
    return jnp.clip(out, -1.5, 1.5)


def bi(x):
    b2 = jnp.clip(x[..., 0], 0.0, 1.0)
    b4 = jnp.clip(x[..., 2], 0.0, 1.0)
    b8 = jnp.clip(x[..., 3], 0.0, 1.0)
    b11 = jnp.clip(x[..., 8], 0.0, 1.0)
    out = ((b11 + b4) - (b8 + b2)) / ((b11 + b4) + (b8 + b2) + 1e-5)
    return jnp.clip(out, -1.0, 1.0)


def msavi2(x):
    red = jnp.clip(x[..., 2], 0.0, 1.0)
    nir = jnp.clip(x[..., 3], 0.0, 1.0)
    radicand = (2.0 * nir + 1.0) ** 2 - 8.0 * (nir - red)
    radicand = jnp.maximum(radicand, 0.0)
    out = (2.0 * nir + 1.0 - jnp.sqrt(radicand)) / 2.0
    return jnp.clip(out, -1.0, 1.0)


def grndvi(x):
    green = jnp.clip(x[..., 1], 0.0, 1.0)
    red = jnp.clip(x[..., 2], 0.0, 1.0)
    nir = jnp.clip(x[..., 3], 0.0, 1.0)
    return (nir - (green + red)) / (nir + (green + red) + 1e-5)


def ndmi(x):
    """(B08 - B11) / (B08 + B11) on the 10-band layout."""
    return (x[..., 3] - x[..., 8]) / (x[..., 3] + x[..., 8])


def all_indices(x):
    """Stack the four model input indices along a new trailing axis."""
    return jnp.stack([evi(x), bi(x), msavi2(x), grndvi(x)], axis=-1)
