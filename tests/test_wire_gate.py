"""Compact wire codec drift gate (mirrors the bf16 gate pattern).

The compact host->device wire format (ttc.io.wire: int8 reference +
sqrt-companded residual S2 planes, native-resolution S1, uint16 slope)
halves the per-tile upload (58 -> ~29.6 MB at production geometry).
It is lossy, so this gate pins:

1. codec-level error bounds — residual quantization stays far below
   the cloud/shadow masker's delta thresholds on clear pixels, and
   bounded everywhere (no clipping: scales are per-date maxima);
2. end-to-end drift — the full ARD+predict chain on the compact wire
   agrees with the uint16 wire raster within the same budget the bf16
   gate allows, and makes identical date-selection decisions.
"""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from ttc.io.forest import ForestFixtureBackend
from ttc.io.wire import (decode_s2_compact, decode_slope_u16,
                         encode_s2_compact, encode_slope_u16,
                         wire_nbytes)
from ttc.preprocess.ard import host_prepare, process_tiles

WEIGHTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "weights", "treecover.npz")


def test_codec_error_bounds():
    raw = ForestFixtureBackend(seed=3, n_dates=8, hw=64).fetch(
        0, 0, None, 2023)
    x = raw.s2_10.astype(np.float32) / 65535.0
    data, sc = encode_s2_compact(raw.s2_10)
    assert data.dtype == np.int8 and data.shape[0] == x.shape[0] + 1
    dec = np.asarray(decode_s2_compact(jnp.asarray(data),
                                       jnp.asarray(sc)))
    err = np.abs(dec - x)
    assert err.max() < 0.01, err.max()
    assert err.mean() < 5e-4, err.mean()
    # clear pixels (small residual vs the temporal median) are where
    # the masker's ~0.02-0.1 delta thresholds operate: error must be
    # an order of magnitude below them
    clear = np.abs(x - np.median(x, axis=0)) < 0.1
    assert err[clear].max() < 2e-3, err[clear].max()

    slope = decode_slope_u16(jnp.asarray(encode_slope_u16(raw.dem)))
    assert np.abs(np.asarray(slope)
                  - np.clip(raw.dem, 0, 90)).max() < 0.002


def test_compact_wire_payload_shrinks():
    raw = ForestFixtureBackend(seed=5, n_dates=8, hw=64).fetch(
        0, 0, None, 2023)
    mb_u = wire_nbytes(host_prepare(raw))
    mb_c = wire_nbytes(host_prepare(raw, wire="compact"))
    assert mb_c < 0.55 * mb_u, (mb_c, mb_u)


@pytest.mark.skipif(not os.path.exists(WEIGHTS),
                    reason="release weights not present")
def test_wire_drift_within_gate():
    """Full chain: raw -> compact-wire ARD -> predict vs the uint16
    wire. Same date decisions; raster drift within the bf16-gate
    budget."""
    import jax

    from ttc.core.config import InferenceConfig
    from ttc.infer.pipeline import TilePredictor
    from ttc.models.unet import inference_model
    from ttc.train.checkpoint import load_params_npz

    params = load_params_npz(WEIGHTS)
    cfg = InferenceConfig(tile_px=110, out_size=66, n_rows=3)
    predictor = TilePredictor(params, cfg, inference_model())

    raws = [ForestFixtureBackend(seed=s, n_dates=8, hw=110,
                                 cloud_fraction=f).fetch(0, 0, None,
                                                         2023)
            for s, f in ((3, 0.05), (7, 0.4))]

    def raster(wire):
        preps = [host_prepare(r, wire=wire) for r in raws]
        outs = process_tiles(prepped_list=preps)
        res = []
        for tile, sm in outs:
            res.append((tile.dates,
                        np.asarray(predictor(
                            sm.s2, sm.s1, sm.dem, sm.s2_median,
                            sm.s1_median, sm.clear_count))))
        return res

    for (dates_u, out_u), (dates_c, out_c) in zip(raster("uint16"),
                                                  raster("compact")):
        # identical date-selection decisions through the full cascade
        np.testing.assert_array_equal(dates_u, dates_c)
        agree = np.mean((out_u == 255) == (out_c == 255))
        assert agree >= 0.999, agree
        valid = (out_u != 255) & (out_c != 255)
        diff = np.abs(out_u[valid].astype(np.float32)
                      - out_c[valid].astype(np.float32))
        assert diff.mean() < 0.5, diff.mean()
        assert np.percentile(diff, 99) <= 3.0
