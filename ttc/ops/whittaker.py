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

    def monthly_weights(self, regrid_w):
        """Compose regrid + smooth + monthly-mean into ONE (outsize, T)
        operator: [P @ (I + lambda D'D)^-1] @ W. Everything in the
        chain is linear along the step axis, so applying the composed
        matrix equals regrid -> smooth -> pair-mean — WITHOUT
        materializing the (24, H, W, C) intermediate, whose narrow
        trailing band dim draws a lane-padded TPU layout that costs
        ~13x its logical size in HBM at production geometry.

        P @ A^-1 is precomputed host-side (one fixed f32 constant) so
        the single runtime matmul is per-column deterministic: padded
        and compacted date axes produce bit-identical valid columns,
        preserving the exact np.delete-equivalence contract
        (tests/test_clouds_validity.py, test_fused_smooth_*)."""
        group = self.size // self.outsize
        p = np.repeat(np.eye(self.outsize, dtype=np.float32),
                      group, axis=1) / group             # (12, 24)
        pa = (p @ self.matrix).astype(np.float32)        # (12, 24)
        return jnp.matmul(jnp.asarray(pa),
                          jnp.asarray(regrid_w, jnp.float32),
                          precision="highest")           # (12, T)
