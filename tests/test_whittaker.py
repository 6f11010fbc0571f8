"""Whittaker smoother: dense-inverse matmul vs scipy sparse LU."""
import numpy as np
import scipy.sparse as sparse
from scipy.sparse.linalg import splu

from ttc.ops.whittaker import WhittakerSmoother, smoother_matrix


def _scipy_operator(lmbd, size):
    diagonals = np.zeros(5, dtype=np.float32)
    diagonals[2] = 1.0
    for _ in range(2):
        diagonals = diagonals[:-1] - diagonals[1:]
    offsets = np.arange(3)
    d = sparse.diags(diagonals, offsets, (size - 2, size), dtype=np.float32)
    coefmat = sparse.eye(size, format="csc", dtype=np.float32) \
        + d.conj().T.dot(d) * lmbd
    return splu(coefmat)


def test_matrix_matches_splu_solve():
    size = 24
    lu = _scipy_operator(100.0, size)
    s = smoother_matrix(100.0, size)
    rng = np.random.default_rng(0)
    y = rng.random((size, 257)).astype(np.float32)
    np.testing.assert_allclose(s @ y, lu.solve(y), rtol=1e-4, atol=1e-5)


def test_interpolate_array_monthly_means():
    sm = WhittakerSmoother(lmbd=100.0, size=24, outsize=12)
    rng = np.random.default_rng(1)
    x = rng.random((24, 8, 8, 14)).astype(np.float32)
    out = np.asarray(sm.interpolate_array(x))
    assert out.shape == (12, 8, 8, 14)

    lu = _scipy_operator(100.0, 24)
    sm_ref = lu.solve(x.reshape(24, -1)).reshape(24, 8, 8, 14)
    monthly_ref = sm_ref.reshape(12, 2, 8, 8, 14).mean(axis=1)
    np.testing.assert_allclose(out, monthly_ref, rtol=1e-4, atol=1e-5)


def test_smoothing_reduces_roughness():
    sm = WhittakerSmoother()
    t = np.linspace(0, 2 * np.pi, 24)
    noisy = (np.sin(t) + np.random.default_rng(2).normal(0, 0.3, 24))
    smoothed = np.asarray(sm.smooth(noisy.astype(np.float32)[:, None]))[:, 0]

    def roughness(x):
        return np.sum(np.diff(x, n=2) ** 2)

    assert roughness(smoothed) < 0.01 * roughness(noisy)
