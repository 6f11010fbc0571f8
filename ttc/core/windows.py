"""Overlapping-window grids for subtile prediction and mosaicking.

The production tile is H=W=618 px; predictions run on a 6x6 grid of
172x172 -> 158x158 windows whose inputs overlap by a 7 px halo
(reference: src/download_and_predict_job.py:1295-1317,
src/tof/tof_downloading.py:498-524).

TPU-first design: instead of slicing/padding each window on the host, we
reflect-pad the whole tile once by `halo` and take 36 fixed-size slices at
static offsets. For edge windows this reproduces the reference's
reflect-pad of the window content exactly, because the pad source rows are
inside the window.
"""
from __future__ import annotations

import numpy as np


def window_grid(tile_px: int, out_size: int, n_rows: int) -> np.ndarray:
    """Window anchor offsets along one axis.

    Matches the reference grid: arange(0, tile_px - out_size, gap) plus the
    flush-right window, where gap = ceil((tile_px - out_size)/(n_rows - 1)).
    """
    gap = int(np.ceil((tile_px - out_size) / (n_rows - 1)))
    xs = np.arange(0, tile_px - out_size, gap)
    xs = np.concatenate([xs, [tile_px - out_size]])
    assert len(xs) == n_rows, (len(xs), n_rows)
    return xs.astype(np.int32)


def window_offsets(tile_px: int, out_size: int, n_rows: int) -> np.ndarray:
    """(n_rows^2, 2) array of (x, y) window anchors in tile coordinates."""
    xs = window_grid(tile_px, out_size, n_rows)
    xx, yy = np.meshgrid(xs, xs, indexing="ij")
    return np.stack([xx.ravel(), yy.ravel()], axis=-1)


def tile_window(h: int, w: int, tile_width: int | None = None,
                tile_height: int | None = None,
                window_size: int = 100) -> np.ndarray:
    """Evenly-overlapping tiling of an h x w raster: (n, 4) rows of
    (x, y, h_tile, w_tile) (reference: src/downloading/utils.py:438-493)."""
    w_tile = tile_width or window_size
    h_tile = tile_height or window_size
    if w_tile > w or h_tile > h:
        raise ValueError("tile dimensions cannot be larger than origin")

    n_x = int(np.ceil(w / w_tile))
    n_y = int(np.ceil(h / h_tile))
    rem_x = n_x * w_tile - w
    rem_y = n_y * h_tile - h

    def _spread(rem, n):
        if n <= 1:
            return np.zeros((0,), dtype=np.int64)
        out = np.full((n - 1,), rem // (n - 1), dtype=np.int64)
        out[: rem % (n - 1)] += 1
        return out

    rems_x = _spread(rem_x, n_x)
    rems_y = _spread(rem_y, n_y)

    tiles = np.zeros((n_x * n_y, 4), dtype=np.int64)
    k = 0
    x = 0
    for i in range(n_x):
        y = 0
        for j in range(n_y):
            tiles[k] = (x, y, h_tile, w_tile)
            k += 1
            if j < n_y - 1:
                y = y + h_tile - rems_y[j]
        if i < n_x - 1:
            x = x + w_tile - rems_x[i]
    return tiles


def make_overlapping_windows(tiles: np.ndarray, diff: int = 7) -> np.ndarray:
    """Expand (n, 4) window rows by `diff` px per side, clamped at the
    raster edges (reference: src/tof/tof_downloading.py:498-524).

    Row layout follows the reference's x-major ordering: the first and
    last n_x rows sit on the left/right raster edge and only get one
    halo in x; rows at the top/bottom of each column only get one halo
    in y.
    """
    out = tiles.astype(np.int64).copy()
    n_x = int(np.sum(out[:, 0] == 0))
    n_y = int(np.sum(out[:, 1] == 0))

    out[:n_x, 2] += diff
    out[-n_x:, 2] += diff
    out[n_x:-n_x, 2] += 2 * diff

    adjust = np.full(len(out), 2 * diff, np.int64)
    for i in range(len(out)):
        if i % n_y == 0 or (i + 1) % n_y == 0:
            adjust[i] -= diff
    out[:, 3] += adjust

    out[n_x:, 0] -= diff
    out[:, 1] -= diff
    out[out < 0] = 0
    return out
