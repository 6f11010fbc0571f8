"""Binary morphology and capped distance transforms on TPU.

The reference leans on scipy.ndimage (binary_dilation/erosion with cross
or full 3x3 structuring elements, iterated; distance_transform_edt capped
at small radii for feathering). On TPU these become iterated
`lax.reduce_window` max/min pools and an iterated chamfer relaxation —
bandwidth-bound elementwise passes that XLA fuses well.

All functions take (..., H, W) float or bool arrays and are jittable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_SQRT2 = 1.4142135623730951


def _pool(x, op, init, size=3, mirror_origin: bool = False):
    """2D reduce_window over the last two axes. For even window sizes
    the pad split follows scipy's footprint origin (left = size//2);
    `mirror_origin` flips it (scipy mirrors the structure for the
    erosion half of closings/openings)."""
    nd = x.ndim
    dims = [1] * nd
    dims[-2] = size
    dims[-1] = size
    strides = [1] * nd
    lo, hi = size // 2, (size - 1) // 2
    if mirror_origin:
        lo, hi = hi, lo
    pads = [(0, 0)] * (nd - 2) + [(lo, hi)] * 2
    return lax.reduce_window(x, init, op, dims, strides, pads)


def dilate(x, iterations: int = 1, cross: bool = True):
    """Binary dilation; `cross` uses the 4-connected structuring element
    (scipy default), otherwise the full 3x3 block."""
    x = x.astype(jnp.float32)
    for _ in range(iterations):
        if cross:
            up = jnp.roll(x, 1, axis=-2).at[..., 0, :].set(0.0)
            dn = jnp.roll(x, -1, axis=-2).at[..., -1, :].set(0.0)
            lf = jnp.roll(x, 1, axis=-1).at[..., :, 0].set(0.0)
            rt = jnp.roll(x, -1, axis=-1).at[..., :, -1].set(0.0)
            x = jnp.maximum(jnp.maximum(jnp.maximum(up, dn),
                                        jnp.maximum(lf, rt)), x)
        else:
            x = _pool(x, lax.max, -jnp.inf, 3)
            x = jnp.clip(x, 0.0, 1.0)
    return x


def erode(x, iterations: int = 1, cross: bool = True):
    """Binary erosion (border pixels erode, matching scipy's default
    zero-padded border)."""
    x = x.astype(jnp.float32)
    for _ in range(iterations):
        if cross:
            up = jnp.roll(x, 1, axis=-2).at[..., 0, :].set(0.0)
            dn = jnp.roll(x, -1, axis=-2).at[..., -1, :].set(0.0)
            lf = jnp.roll(x, 1, axis=-1).at[..., :, 0].set(0.0)
            rt = jnp.roll(x, -1, axis=-1).at[..., :, -1].set(0.0)
            x = jnp.minimum(jnp.minimum(jnp.minimum(up, dn),
                                        jnp.minimum(lf, rt)), x)
        else:
            pad_cfg = [(0, 0)] * (x.ndim - 2) + [(1, 1), (1, 1)]
            xp = jnp.pad(x, pad_cfg, constant_values=0.0)
            x = _pool(xp, lax.min, jnp.inf, 3)
            sl = tuple([slice(None)] * (x.ndim - 2) + [slice(1, -1)] * 2)
            x = x[sl]
    return x


def binary_closing_then_opening(x, close_iters: int, open_iters: int,
                                cross: bool = True):
    x = erode(dilate(x, close_iters, cross), close_iters, cross)
    return dilate(erode(x, open_iters, cross), open_iters, cross)


def grey_closing(x, size: int):
    """Greyscale closing with a size x size square window
    (dilate = max pool, then erode = min pool with the mirrored origin,
    matching scipy's structure reflection for even sizes)."""
    d = _pool(x, lax.max, -jnp.inf, size)
    e = -_pool(-d, lax.max, -jnp.inf, size, mirror_origin=True)
    return e


def maximum_filter(x, size: int):
    return _pool(x.astype(jnp.float32), lax.max, -jnp.inf, size)


def minimum_filter(x, size: int):
    return -_pool(-x.astype(jnp.float32), lax.max, -jnp.inf, size)


def capped_edt(zero_mask, cap: float):
    """Euclidean distance to the nearest True pixel of `zero_mask`, capped.

    Chamfer relaxation: iterate d <- min(d, neighbors + step) with weights
    1 (axial) and sqrt(2) (diagonal), ceil(cap) times. Within the cap
    radius this matches the exact EDT to <~4% (golden-tested); the
    reference only ever uses capped distances (3-15 px) for feathering
    (reference: src/preprocessing/cloud_removal.py:774-798,
    src/download_and_predict_job.py:1117-1119).
    """
    zero_mask = zero_mask.astype(bool)
    cap = float(cap)
    big = cap + 2.0
    d = jnp.where(zero_mask, 0.0, big)
    iters = int(np.ceil(cap)) + 1

    nd = d.ndim
    ones = [1] * nd

    def _minpool(x, wh, ww):
        dims = list(ones)
        dims[-2], dims[-1] = wh, ww
        pads = [(0, 0)] * (nd - 2) + [(wh // 2, wh // 2),
                                      (ww // 2, ww // 2)]
        return lax.reduce_window(x, big, lax.min, dims, ones, pads)

    def body(_, d):
        # axial relaxation: 1-D min pools (window includes the center,
        # which only re-proposes d+1 >= d — harmless); diagonal via the
        # full 3x3 min, which can only propose axial+sqrt2 >= axial+1,
        # so the combined min is exactly the 8-neighbor chamfer step.
        # reduce_window's +inf-ish padding matches the border `big`s
        # the roll-based formulation set explicitly.
        axial = jnp.minimum(_minpool(d, 3, 1), _minpool(d, 1, 3)) + 1.0
        diag = _minpool(d, 3, 3) + _SQRT2
        return jnp.minimum(d, jnp.minimum(axial, diag))

    d = jax.lax.fori_loop(0, iters, body, d)
    return jnp.minimum(d, cap)


def feathered_weight(mask, radius: float = 12.0):
    """Distance-feathered [0,1] interpolation weight from a binary mask:
    1 inside the mask, decaying to 0 over `radius` px outside
    (the reference's blur via capped EDT of the inverse mask / radius,
    reference: src/preprocessing/cloud_removal.py:774-798)."""
    dist = capped_edt(mask.astype(bool), radius)
    return 1.0 - dist / radius
