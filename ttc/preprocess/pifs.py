"""Pseudo-invariant feature selection via canonical correlation.

Replacement for the reference's sklearn-CCA PIF picker
(reference: src/preprocessing/cloud_removal.py:33-64): project source
and reference spectra onto their top-2 canonical directions and keep
the 10% of pixels with the smallest canonical distance — the most
radiometrically stable pixels, used for cross-image alignment.

Implemented with a closed-form SVD CCA (whitened cross-covariance) in
jax — no iterative sklearn fit.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _whiten(x, eps=1e-6):
    mean = jnp.mean(x, axis=0, keepdims=True)
    xc = x - mean
    cov = xc.T @ xc / x.shape[0]
    vals, vecs = jnp.linalg.eigh(cov)
    inv_sqrt = vecs @ jnp.diag(1.0 / jnp.sqrt(jnp.maximum(vals, eps))) \
        @ vecs.T
    return xc @ inv_sqrt, inv_sqrt, mean


def cca_project(x, y, n_components: int = 2):
    """Canonical projections of paired samples x, y: (N, D) ->
    ((N, k), (N, k))."""
    xw, _, _ = _whiten(x)
    yw, _, _ = _whiten(y)
    cross = xw.T @ yw / x.shape[0]
    u, _, vt = jnp.linalg.svd(cross)
    return xw @ u[:, :n_components], yw @ vt.T[:, :n_components]


def identify_pifs(src: np.ndarray, ref: np.ndarray,
                  keep_fraction: float = 0.10):
    """Return the (src, ref) subsets at pseudo-invariant pixels: the
    `keep_fraction` of samples with the smallest distance between their
    canonical projections."""
    xs = jnp.asarray(src, jnp.float32)
    ys = jnp.asarray(ref, jnp.float32)
    px, py = cca_project(xs, ys)
    dist = jnp.sum((px - py) ** 2, axis=1)
    k = max(int(src.shape[0] * keep_fraction), 1)
    idx = jnp.argsort(dist)[:k]
    return np.asarray(xs[idx]), np.asarray(ys[idx]), np.asarray(idx)
