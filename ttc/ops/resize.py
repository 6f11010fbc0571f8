"""Resampling ops: the 20 m / 40 m / 160 m -> 10 m band alignment chain.

The reference uses skimage.transform.resize (order-1 bilinear,
anti-aliased) and np.repeat upsampling. Device-side we use
jax.image.resize (bilinear) and nearest repeat; shapes are static.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_bilinear(x, out_hw):
    """Bilinear resize of (..., H, W, C) or (..., H, W) arrays."""
    if x.ndim == 2:
        return jax.image.resize(x, out_hw, method="bilinear")
    shape = x.shape[:-3] + (out_hw[0], out_hw[1], x.shape[-1])
    return jax.image.resize(x, shape, method="bilinear")


def upsample_nearest(x, factor: int):
    """(..., H, W, C) -> (..., H*f, W*f, C) by pixel repetition."""
    x = jnp.repeat(x, factor, axis=-3)
    return jnp.repeat(x, factor, axis=-2)
