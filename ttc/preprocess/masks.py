"""Per-window screening masks used at prediction time.

- hollstein_cloud: the simple decision-rule cloud seed from Hollstein et
  al. 2016 fig. 6 (reference: src/download_and_predict_job.py:1328-1340).
- bright_surface_weight: attenuation of false positives over bright bare
  ground (reference: src/download_and_predict_job.py:1099-1122).

Both are batched, jittable device ops over (..., H, W, C) stacks.
"""
from __future__ import annotations

import jax.numpy as jnp

from ttc.ops.indices import evi
from ttc.ops.morphology import capped_edt, dilate


def hollstein_cloud(arr):
    """Cloud seed mask for a (..., T, H, W, C>=10) stack: per-date rule
    mask, opened (erode 2) then dilated 10."""
    step1 = arr[..., 7] > 0.166
    step2 = arr[..., 1] > 0.21
    step3 = arr[..., 5] / arr[..., 8] < 4.292
    cl = (step1 & step2 & step3).astype(jnp.float32)
    # reference: binary_dilation(1 - binary_dilation(cl == 0, 2), 10)
    # == dilate(erode(cl, 2), 10) with the cross structure
    cl = dilate(1.0 - dilate(1.0 - cl, iterations=2), iterations=10)
    return cl


def bright_surface_map(window_stack):
    """(T, H, W, C) stack -> uncropped (H, W) bright-bare-surface
    weight map (NIR/SWIR < 0.9, TCI > 0.2, EVI < 0.3 on >1 date).

    The whole chain's influence radius is 2+1 dilation + 3 px capped
    EDT = 6 px, strictly inside the 7 px prediction halo — so the map
    computed ONCE on a padded tile and window-sliced is bit-identical
    to evaluating it per overlapping window (the predictor exploits
    this to avoid materializing the unnormalized window batch)."""
    nir_swir = window_stack[..., 3] / (window_stack[..., 8] + 0.01)
    flag = (nir_swir < 0.9) \
        & (jnp.mean(window_stack[..., :3], axis=-1) > 0.2) \
        & (evi(window_stack) < 0.3)
    bright = jnp.sum(flag, axis=-3) > 1  # per-pixel across dates

    # reference: two complement dilations == erode 2 then dilate 1
    bright = dilate(1.0 - dilate(1.0 - bright.astype(jnp.float32),
                                 iterations=2), iterations=1)
    return capped_edt(bright > 0, 3.0) / 3.0


def bright_surface_weight(window_stack, halo: int = 7):
    """(T, H, W, C) window -> (H-2*halo, W-2*halo) multiplicative weight
    in [0, 1] attenuating predictions over persistently bright bare
    surfaces (reference: src/download_and_predict_job.py:1099-1122)."""
    return bright_surface_map(window_stack)[..., halo:-halo,
                                            halo:-halo]
