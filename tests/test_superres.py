"""Super-resolution model: parity vs the released frozen graph.

The golden fixture (tests/fixtures_sr_golden.npz) was produced by running
the reference's frozen superresolve_graph.pb with TF on random input —
regenerate with the snippet in tools/convert_sr_weights.py's history.
"""
import os

import jax
import numpy as np
import pytest

from ttc.models.superres import SuperResolver, params_from_npz, superresolve_tile

HERE = os.path.dirname(__file__)
GOLDEN = os.path.join(HERE, "fixtures_sr_golden.npz")
WEIGHTS = os.path.join(HERE, "..", "weights", "superres.npz")

pytestmark = pytest.mark.skipif(
    not (os.path.exists(GOLDEN) and os.path.exists(WEIGHTS)),
    reason="SR golden fixture / weights missing")


def test_sr_matches_frozen_graph():
    data = np.load(GOLDEN)
    params = params_from_npz(WEIGHTS)
    model = SuperResolver()
    out = np.asarray(jax.jit(
        lambda p, a, b: model.apply(p, a, b))(
            params, data["x"], data["bilinear"]))
    np.testing.assert_allclose(out, data["out"], atol=2e-6)


def test_superresolve_tile_writes_back_bands():
    data = np.load(GOLDEN)
    params = params_from_npz(WEIGHTS)
    stack = jax.numpy.asarray(data["x"])
    out = np.asarray(superresolve_tile(params, stack))
    # bands 0-3 untouched, 4-9 replaced with the SR output
    np.testing.assert_array_equal(out[..., :4], data["x"][..., :4])
    np.testing.assert_allclose(out[..., 4:10], data["out"], atol=2e-6)


def test_sr_output_close_to_bilinear():
    """The network predicts a bounded tanh delta on top of bilinear."""
    data = np.load(GOLDEN)
    assert np.abs(data["out"] - data["bilinear"]).max() <= 1.0