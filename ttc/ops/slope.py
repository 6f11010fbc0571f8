"""DEM slope in degrees, vectorized.

The reference computes per-pixel slope with a pure-Python double loop
(reference: src/preprocessing/slope.py:5-31,101-138) — one of its hottest
CPU paths. The same central-difference normal-vector formula is a handful
of shifted-array ops on the VPU.
"""
from __future__ import annotations

import jax.numpy as jnp


def calc_slope(dem, x_size, y_size, z_scale: float = 1.0,
               min_slope: float | None = 0.02):
    """Slope in degrees for a (H, W) DEM.

    x_size / y_size: per-pixel ground size arrays (H, W) in meters (scalars
    broadcast). Border pixels are 0 like the reference's untouched border.
    """
    dem = jnp.asarray(dem, jnp.float32)
    x_size = jnp.broadcast_to(jnp.asarray(x_size, jnp.float32), dem.shape)
    y_size = jnp.broadcast_to(jnp.asarray(y_size, jnp.float32), dem.shape)

    dx = 2.0 * x_size
    dy = 2.0 * y_size
    # dz/dx across columns, dz/dy across rows (reference indexing:
    # inBlock[0, y, x-1] - inBlock[0, y, x+1])
    dzx = (jnp.roll(dem, 1, axis=1) - jnp.roll(dem, -1, axis=1)) * z_scale
    dzy = (jnp.roll(dem, 1, axis=0) - jnp.roll(dem, -1, axis=0)) * z_scale

    nx = -dy * dzx
    ny = -dx * dzy
    nz = dx * dy
    slope_rad = jnp.arccos(nz / jnp.sqrt(nx ** 2 + ny ** 2 + nz ** 2))
    slope_deg = jnp.degrees(slope_rad)

    # zero border (the reference loop never writes row/col 0 and -1)
    slope_deg = slope_deg.at[0, :].set(0.0).at[-1, :].set(0.0)
    slope_deg = slope_deg.at[:, 0].set(0.0).at[:, -1].set(0.0)
    if min_slope is not None:
        slope_deg = jnp.where(
            jnp.logical_and(slope_deg > 0, slope_deg < min_slope),
            min_slope, slope_deg)
    return slope_deg
