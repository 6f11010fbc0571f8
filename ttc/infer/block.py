"""Seam-free multi-tile block prediction (shared-halo super-tiles).

The reference predicts every 618 px tile independently with
reflect-padded (fabricated) edge context, then runs four dedicated
resegmentation scripts to detect and repair the seams that creates
(reference: src/resegment_tiles_wide.py et al., SURVEY §2.9). On TPU
the cheaper fix is to never create interior seams: adjacent tiles are
stitched into one g*g super-tile, the standard overlapping-window
grid runs across the WHOLE block (windows straddle former tile
boundaries and see real neighbor data), the Gaussian mosaic blends
across them, and the result is sliced back into per-tile rasters.
Former interior boundaries are then indistinguishable from any other
pixel — resegmentation remains necessary only at block edges
(SURVEY §7 step 6).

Memory: a 2x2 block of production tiles is a 1236 px program with 144
windows (~4 GB peak activations on v5e) — fits single-chip; the block
program is shape-static so it compiles once.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ttc.core.config import InferenceConfig
from ttc.infer.pipeline import predict_tile
from ttc.models.unet import TreeCoverNet

# SmoothedTile fields consumed by the predictor, with their (H, W)
# axis positions for stitching
_FIELDS = (("s2", 1, 2), ("s1", 1, 2), ("dem", 0, 1),
           ("s2_median", 0, 1), ("s1_median", 0, 1),
           ("clear_count", 0, 1))


def block_config(cfg: InferenceConfig, grid: int) -> InferenceConfig:
    """Window geometry for a grid x grid super-tile: same window size,
    the grid of anchors scaled with the raster so window density (and
    the flush-right rule) matches the single-tile layout."""
    return dataclasses.replace(cfg, tile_px=cfg.tile_px * grid,
                               n_rows=cfg.n_rows * grid)


def stitch_tiles(sms_grid):
    """Row-major grid (list of lists) of SmoothedTile -> stitched
    predictor inputs (s2, s1, dem, s2_median, s1_median, clear_count)
    covering the whole block. Stays on device."""
    args = []
    for f, ax_h, ax_w in _FIELDS:
        rows = [jnp.concatenate([jnp.asarray(getattr(s, f))
                                 for s in row], axis=ax_w)
                for row in sms_grid]
        args.append(jnp.concatenate(rows, axis=ax_h))
    return tuple(args)


def split_block_raster(raster, grid: int, tile_px: int):
    """(grid*tile_px, grid*tile_px) block raster -> row-major grid of
    per-tile (tile_px, tile_px) rasters."""
    return [[raster[i * tile_px:(i + 1) * tile_px,
                    j * tile_px:(j + 1) * tile_px]
             for j in range(grid)] for i in range(grid)]


class BlockPredictor:
    """Compiled shared-halo block-inference program.

    Usage:
        bp = BlockPredictor(params, cfg, model, grid=2)
        rasters = bp([[sm00, sm01], [sm10, sm11]])   # row-major grid
        # rasters[i][j] is tile (i, j)'s (tile_px, tile_px) raster

    Equivalent to running predict_tile on the stitched scene: interior
    tile boundaries receive true neighbor context and cross-boundary
    mosaic blending, so they carry no seam
    (tests/test_block_predict.py pins both properties).
    """

    def __init__(self, params, cfg: InferenceConfig | None = None,
                 model: TreeCoverNet | None = None, grid: int = 2):
        self.cfg = cfg or InferenceConfig()
        self.model = model or TreeCoverNet()
        self.params = params
        self.grid = grid
        self.block_cfg = block_config(self.cfg, grid)
        self._fn = jax.jit(functools.partial(
            predict_tile, model=self.model, cfg=self.block_cfg))

    def __call__(self, sms_grid):
        g = self.grid
        assert len(sms_grid) == g and all(len(r) == g
                                          for r in sms_grid), \
            f"expected a {g}x{g} row-major grid of SmoothedTiles"
        raster = self._fn(self.params, *stitch_tiles(sms_grid))
        return split_block_raster(raster, g, self.cfg.tile_px)
