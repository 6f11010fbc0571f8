"""Shared-halo block prediction: no interior seams by construction.

Pins the two properties of ttc.infer.block.BlockPredictor:
1. predicting a 2x2 grid of tiles as a block is EXACTLY predicting the
   stitched scene with the scaled window grid (stitch/split are
   inverses), and
2. independent per-tile prediction (reflect-padded fake edge context,
   the reference's mode) produces a measurably larger discontinuity
   across the former tile boundary than the block mode, which is
   boundary-free.
"""
import os
import types

import numpy as np
import pytest

import jax.numpy as jnp

from ttc.core.config import InferenceConfig
from ttc.infer.block import BlockPredictor, block_config
from ttc.infer.pipeline import TilePredictor, predict_tile
from ttc.models.unet import TreeCoverNet

WEIGHTS = os.path.join(os.path.dirname(__file__), "..", "weights",
                       "treecover.npz")

pytestmark = pytest.mark.skipif(not os.path.exists(WEIGHTS),
                                reason="release weights missing")


def _smooth_field(rng, shape, blur: int = 9):
    """Spatially-continuous random field (uniform noise box-blurred)."""
    x = rng.random(shape).astype(np.float32)
    for axis in (-3, -2) if len(shape) >= 3 else (-2, -1):
        k = np.ones(blur, np.float32) / blur
        x = np.apply_along_axis(
            lambda v: np.convolve(v, k, mode="same"), axis, x)
    return x


def _scene(hw: int, rng):
    """A continuous synthetic smoothed scene at hw x hw."""
    s2 = 0.15 + 0.5 * _smooth_field(rng, (12, hw, hw, 14))
    s1 = 0.2 + 0.5 * _smooth_field(rng, (12, hw, hw, 2))
    dem = _smooth_field(rng, (hw, hw, 1))[..., 0] * 0.3
    s2_med = 0.15 + 0.5 * _smooth_field(rng, (hw, hw, 14))
    s1_med = 0.2 + 0.5 * _smooth_field(rng, (hw, hw, 2))
    clear = np.full((hw, hw), 8.0, np.float32)
    return s2, s1, dem, s2_med, s1_med, clear


def _quadrant(arrs, i, j, px):
    s2, s1, dem, s2_med, s1_med, clear = arrs
    sh, sw = slice(i * px, (i + 1) * px), slice(j * px, (j + 1) * px)
    return types.SimpleNamespace(
        s2=s2[:, sh, sw], s1=s1[:, sh, sw], dem=dem[sh, sw],
        s2_median=s2_med[sh, sw], s1_median=s1_med[sh, sw],
        clear_count=clear[sh, sw])


def test_block_predict_seamless(rng):
    from ttc.train.checkpoint import load_params_npz

    params = load_params_npz(WEIGHTS)
    cfg = InferenceConfig(tile_px=110, out_size=66, n_rows=3)
    model = TreeCoverNet()
    px = cfg.tile_px
    arrs = _scene(2 * px, rng)

    grid = [[_quadrant(arrs, i, j, px) for j in range(2)]
            for i in range(2)]
    bp = BlockPredictor(params, cfg, model, grid=2)
    block = bp(grid)

    # 1. block == whole-scene prediction with the block window grid
    whole = np.asarray(predict_tile(
        params, *[jnp.asarray(a) for a in arrs], model=model,
        cfg=block_config(cfg, 2)))
    stitched_block = np.block([[np.asarray(block[0][0]),
                                np.asarray(block[0][1])],
                               [np.asarray(block[1][0]),
                                np.asarray(block[1][1])]])
    np.testing.assert_array_equal(stitched_block, whole)

    # 2. independent per-tile prediction leaves a seam; block does not
    tp = TilePredictor(params, cfg, model)
    per_tile = np.block(
        [[np.asarray(tp(q.s2, q.s1, q.dem, q.s2_median, q.s1_median,
                        q.clear_count)) for q in row] for row in grid])

    def seam_step(r):
        """Jump across the horizontal+vertical boundary vs the mean
        neighboring-row jump away from it (valid pixels only)."""
        r = r.astype(np.float32)
        h = np.abs(r[px - 1, :] - r[px, :]).mean()
        v = np.abs(r[:, px - 1] - r[:, px]).mean()
        base = np.abs(np.diff(r, axis=0)).mean()
        return (h + v) / 2, base

    seam_b, base_b = seam_step(stitched_block)
    seam_t, _ = seam_step(per_tile)
    # block boundary jump is statistically just another pixel step
    assert seam_b <= 2.0 * base_b, (seam_b, base_b)
    # and strictly smaller than the reflect-halo per-tile seam
    assert seam_b < seam_t, (seam_b, seam_t)
