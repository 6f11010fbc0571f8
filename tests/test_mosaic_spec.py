"""Device mosaic vs an independent numpy implementation of the
reference's load_mosaic_predictions math (Gaussian weights, agreement
reweighting, nodata rules) on synthetic window predictions."""
import numpy as np
import pytest

from ttc.core.config import InferenceConfig
from ttc.core.windows import window_offsets
from ttc.infer.mosaic import mosaic_predictions
from ttc.ops.filters import fspecial_gauss


def _numpy_mosaic(preds, cfg):
    """Straight-line numpy mirror of the reference mosaic
    (download_and_predict_job.py:1515-1641) for spec checking."""
    from scipy import ndimage

    offsets = window_offsets(cfg.tile_px, cfg.out_size, cfg.n_rows)
    n = len(offsets)
    hw, s = cfg.tile_px, cfg.out_size
    stack = np.full((hw, hw, n), np.nan, np.float32)
    mults = np.zeros((hw, hw, n), np.float32)
    gauss = fspecial_gauss(s, cfg.gauss_sigma)
    for i, (ox, oy) in enumerate(offsets):
        p = preds[i].astype(np.float32)
        p = np.where(p >= 255, 255.0, p * 100.0)
        stack[ox:ox + s, oy:oy + s, i] = p
        g = gauss.copy()
        g[p > 100] = 0.0
        mults[ox:ox + s, oy:oy + s, i] = g

    # agreement reweighting
    ratios = np.zeros(n)
    for i in range(n):
        sub = stack[..., i]
        others = np.delete(stack, i, -1)
        sel = ~np.isnan(sub)
        others_mean = np.nanmean(others[sel], axis=-1)
        ratios[i] = np.nanmean(np.abs(others_mean - sub[sel]))
    multipliers = np.clip(np.median(ratios) / ratios, None, 1.5)
    mults = mults * multipliers[None, None, :]

    stack[stack > 100] = np.nan
    mults[np.isnan(stack)] = 0.0
    wsum = mults.sum(-1, keepdims=True)
    wsum[wsum == 0] = 1.0
    mults = mults / wsum
    all_nan = np.all(np.isnan(stack), axis=-1)
    out = np.nansum(stack * mults, axis=-1)
    out[all_nan] = 255.0
    out[out <= 15.0] = 0.0
    out[out > 100] = 255.0
    nodata = ndimage.binary_dilation(
        out == 255, ndimage.generate_binary_structure(2, 2),
        iterations=10)
    out[nodata] = 255.0
    return out.astype(np.uint8)


@pytest.mark.parametrize("seed", [0, 1])
def test_mosaic_matches_numpy_spec(seed):
    cfg = InferenceConfig(tile_px=110, out_size=66, n_rows=3)
    rng = np.random.default_rng(seed)
    preds = rng.random((9, 66, 66)).astype(np.float32) * 0.9
    if seed == 1:
        preds[3] = 255.0            # a dead window
        preds[5, :10, :10] = 255.0  # partial nodata
    got = np.asarray(mosaic_predictions(preds, cfg)).astype(np.int32)
    ref = _numpy_mosaic(preds, cfg).astype(np.int32)
    # uint8 rounding at bin edges may differ by 1
    diff = np.abs(got - ref)
    valid = (got != 255) & (ref != 255)
    assert np.mean((got == 255) == (ref == 255)) > 0.999
    assert diff[valid].max() <= 1
    assert (diff[valid] > 0).mean() < 0.02
