"""Whittaker smoothing as a dense MXU matmul.

The reference factorizes (I + lambda * D2'D2) once with sparse LU and
back-substitutes per pixel series (reference:
src/preprocessing/whittaker_smoother.py:8-69). On TPU the operator is a
fixed (24, 24) matrix, so we precompute its dense inverse S once and apply
smoothing as

    smoothed = S @ X,  X: (24, H*W*C)

— a single MXU contraction over the whole tile, followed by a 24 -> 12
monthly pairwise mean.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def second_difference_matrix(size: int) -> np.ndarray:
    """(size-2, size) second-difference operator D2."""
    d = np.zeros((size - 2, size), dtype=np.float64)
    for i in range(size - 2):
        d[i, i] = 1.0
        d[i, i + 1] = -2.0
        d[i, i + 2] = 1.0
    return d


def smoother_matrix(lmbd: float, size: int) -> np.ndarray:
    """Dense inverse of (I + lambda * D2'D2), float32."""
    d = second_difference_matrix(size)
    a = np.eye(size) + lmbd * (d.T @ d)
    return np.linalg.inv(a).astype(np.float32)


class WhittakerSmoother:
    """Drop-in equivalent of the reference Smoother, device-resident.

    smooth(x): (size, ...) -> smoothed along axis 0.
    interpolate_array(x): smooth then average pairs of biweekly steps into
    `outsize` monthly steps (reference: whittaker_smoother.py:44-69).
    """

    def __init__(self, lmbd: float = 100.0, size: int = 24,
                 outsize: int = 12):
        self.size = size
        self.outsize = outsize
        self.matrix = jnp.asarray(smoother_matrix(lmbd, size))

    def smooth(self, x):
        flat = x.reshape(self.size, -1)
        out = jnp.matmul(self.matrix, flat, precision="highest",
                         preferred_element_type=jnp.float32)
        return out.reshape(x.shape)

    def interpolate_array(self, x):
        x = self.smooth(x)
        group = self.size // self.outsize
        x = x.reshape((self.outsize, group) + x.shape[1:])
        return jnp.mean(x, axis=1)
