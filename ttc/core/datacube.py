"""Datacube container: fixed-shape date-stamped raster stacks.

The reference freely deletes dates from its arrays (np.delete on missing /
cloudy / hazy images). XLA requires static shapes, so the framework's core
container is a fixed-capacity stack with an explicit per-date validity
mask; every op is mask-aware. Invalid slots hold zeros and weight 0.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DateStack:
    """A (T_max, H, W, C) image stack with per-slot day-of-year + validity.

    data:  (T, H, W, C) float32
    doy:   (T,) int32 day-of-year per slot (undefined where invalid)
    valid: (T,) bool/float mask of occupied slots
    """

    data: Any
    doy: Any
    valid: Any

    def tree_flatten(self):
        return (self.data, self.doy, self.valid), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def capacity(self) -> int:
        return self.data.shape[0]

    def n_valid(self):
        return jnp.sum(self.valid.astype(jnp.int32))

    @classmethod
    def from_arrays(cls, data: np.ndarray, doy: np.ndarray,
                    capacity: int | None = None) -> "DateStack":
        """Pack a ragged (t, H, W, C) stack into fixed capacity."""
        t = data.shape[0]
        cap = capacity or t
        if t > cap:
            raise ValueError(f"{t} dates exceed capacity {cap}")
        pad = cap - t
        data_p = np.concatenate(
            [np.asarray(data, np.float32),
             np.zeros((pad,) + data.shape[1:], np.float32)], axis=0)
        doy_p = np.concatenate(
            [np.asarray(doy, np.int32), np.zeros((pad,), np.int32)])
        valid = np.concatenate(
            [np.ones((t,), bool), np.zeros((pad,), bool)])
        return cls(jnp.asarray(data_p), jnp.asarray(doy_p),
                   jnp.asarray(valid))

    def drop(self, kill_mask):
        """Invalidate slots where kill_mask is True (fixed-shape analogue of
        the reference's np.delete on dates)."""
        keep = jnp.logical_and(self.valid, jnp.logical_not(kill_mask))
        data = jnp.where(keep[:, None, None, None], self.data, 0.0)
        return DateStack(data, self.doy, keep)

    def masked_median(self):
        """Per-pixel median over valid dates (NaN-free, fixed shape)."""
        return masked_median(self.data, self.valid)


def masked_median(data, valid, axis: int = 0):
    """Median over `axis` counting only slots where valid[t].

    Invalid entries are pushed to +inf, a min/max sorting network
    orders the (small, static) axis without an XLA sort/relayout, and
    the two middle elements of the valid prefix are selected by
    one-hot sum (the valid count is a traced scalar).
    """
    from ttc.ops.sortnet import sort_axis0

    valid = valid.astype(bool)
    t = data.shape[axis]
    big = jnp.asarray(jnp.finfo(data.dtype).max, data.dtype)
    shape = [1] * data.ndim
    shape[axis] = t
    vmask = valid.reshape(shape)
    filled = jnp.where(vmask, data, big)
    srt = sort_axis0(jnp.moveaxis(filled, axis, 0))
    n = jnp.maximum(jnp.sum(valid.astype(jnp.int32)), 1)
    lo = (n - 1) // 2
    hi = n // 2
    lo_v = jnp.zeros_like(srt[0])
    hi_v = jnp.zeros_like(srt[0])
    for i in range(t):
        lo_v = lo_v + jnp.where(lo == i, srt[i], 0.0)
        hi_v = hi_v + jnp.where(hi == i, srt[i], 0.0)
    return 0.5 * (lo_v + hi_v)


def masked_mean(data, valid, axis: int = 0):
    valid = valid.astype(data.dtype)
    shape = [1] * data.ndim
    shape[axis] = data.shape[axis]
    w = valid.reshape(shape)
    n = jnp.maximum(jnp.sum(valid), 1.0)
    return jnp.sum(data * w, axis=axis) / n
