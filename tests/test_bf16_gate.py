"""bf16 inference drift gate.

bf16 is the production inference default (unet.inference_model); this
gate keeps it honest against fp32 on the trained release weights.
Full-tile (618 px) measurement on device recorded in
tools/bench_bf16_drift.py: mean 0.011 pp, p99 0.00 pp, nodata
agreement 100%."""
import os

import numpy as np
import pytest

WEIGHTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "weights", "treecover.npz")


@pytest.mark.skipif(not os.path.exists(WEIGHTS),
                    reason="release weights not present")
def test_bf16_drift_within_gate():
    import jax

    from ttc.core.config import InferenceConfig
    from ttc.infer.pipeline import TilePredictor
    from ttc.models.unet import TreeCoverNet, inference_model
    from ttc.train.checkpoint import load_params_npz

    params = load_params_npz(WEIGHTS)
    cfg = InferenceConfig(tile_px=110, out_size=66, n_rows=3)
    hw = cfg.tile_px
    rng = np.random.default_rng(7)
    args = (
        (rng.random((12, hw, hw, 14)) * 0.4).astype(np.float32),
        (rng.random((12, hw, hw, 2)) * 0.6).astype(np.float32),
        (rng.random((hw, hw)) * 0.3).astype(np.float32),
        (rng.random((hw, hw, 14)) * 0.4).astype(np.float32),
        (rng.random((hw, hw, 2)) * 0.6).astype(np.float32),
        np.full((hw, hw), 8.0, np.float32),
    )
    out32 = np.asarray(TilePredictor(params, cfg,
                                     inference_model(fp32=True))(*args))
    out16 = np.asarray(TilePredictor(params, cfg,
                                     inference_model())(*args))

    agree = np.mean((out32 == 255) == (out16 == 255))
    assert agree >= 0.999
    valid = (out32 != 255) & (out16 != 255)
    diff = np.abs(out32[valid].astype(np.float32)
                  - out16[valid].astype(np.float32))
    assert diff.mean() < 0.2  # pp of tree cover
    assert np.percentile(diff, 99) <= 2.0
