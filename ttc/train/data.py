"""Training data pipeline: stratified batching and augmentation.

Host-side numpy, feeding the device train step.

- equibatch: tree-cover-stratified batch composition — 9 density bins
  with a fixed per-batch mix including 3 empty samples per 11
  (reference: src/train/src/data_utils.py:216-270).
- augment_batch: per-sample random quarter-window step selection, a
  random-subset median as the 5th step, 4-way flip augmentation, and
  slope-band jitter (reference: src/train/src/data_utils.py:135-213).
"""
from __future__ import annotations

import numpy as np

from ttc.core.bands import NORM_MAX, NORM_MIN

DENSITY_EDGES = [9.0, 17.0, 27.0, 40.0, 63.0, 105.0, 158.0]


def equibatch(train_ids, train_y, rng: np.random.Generator | None = None):
    """Reorder sample ids so every 11 consecutive ids follow the fixed
    density mix (3 empty + one from each of 8 occupancy bins)."""
    rng = rng or np.random.default_rng()
    ids = np.array(train_ids)
    rng.shuffle(ids)
    sums = np.array([np.sum(train_y[i]) for i in ids])

    edges = [2.0] + DENSITY_EDGES
    bins = [ids[sums <= edges[0]]]
    for lo, hi in zip(edges[:-1], edges[1:]):
        bins.append(ids[(sums > lo) & (sums <= hi)])
    bins.append(ids[sums > edges[-1]])

    bins = [b if len(b) else ids for b in bins]  # degenerate-bin fallback
    maxes = [len(b) for b in bins]
    cur = [0] * len(bins)
    out = []
    for _ in range(len(ids) // len(bins)):
        for i in range(len(cur)):
            if cur[i] > maxes[i] - 1:
                cur[i] = 0
        if cur[0] >= maxes[0] - 3:
            cur[0] = 0
        group = [bins[0][cur[0]], bins[0][(cur[0] + 1) % maxes[0]],
                 bins[0][(cur[0] + 2) % maxes[0]]]
        group += [bins[i][cur[i]] for i in range(1, len(bins))]
        rng.shuffle(group)
        out.extend(group)
        cur = [c + 1 for c in cur]
        cur[0] += 2
    return out


def _unapply_norm(x, idx):
    mid = (NORM_MAX[idx] + NORM_MIN[idx]) / 2
    rng_ = NORM_MAX[idx] - NORM_MIN[idx]
    return x * (rng_ / 2) + mid


def _apply_norm(x, idx):
    mid = (NORM_MAX[idx] + NORM_MIN[idx]) / 2
    rng_ = NORM_MAX[idx] - NORM_MIN[idx]
    return (x - mid) / (rng_ / 2)


def augment_batch(batch_ids, train_x, train_y, length: int = 4,
                  in_size: int = 28, out_size: int = 14,
                  rng: np.random.Generator | None = None):
    """Build an augmented (B, length+1, S, S, C) batch from the monthly
    (N, 12, S, S, C) training tensor."""
    rng = rng or np.random.default_rng()
    b = len(batch_ids)
    x = train_x[batch_ids]
    n_bands = x.shape[-1]

    # 4 random steps from fixed quarter windows + random-subset median
    sel = np.zeros((b, 4), dtype=np.int64)
    sel[:, 0] = rng.integers(0, 4, b)
    sel[:, 1] = rng.integers(3, 7, b)
    sel[:, 2] = rng.integers(6, 10, b)
    sel[:, 3] = rng.integers(9, 12, b)

    x_batch = np.zeros((b, length + 1, in_size, in_size, n_bands),
                       dtype=np.float32)
    for i in range(b):
        med_steps = np.unique(rng.integers(0, 12, 12))
        x_batch[i, :-1] = x[i, sel[i]]
        x_batch[i, -1] = np.median(x[i, med_steps], axis=0)

    y_batch = np.array(train_y[batch_ids], dtype=np.float32)
    y_batch = y_batch.reshape(b, out_size, out_size)

    flips = rng.choice(4, b)
    for i in range(b):
        if flips[i] == 1:
            x_batch[i] = np.flip(x_batch[i], 1)
            y_batch[i] = np.flip(y_batch[i], 0)
        elif flips[i] == 2:
            x_batch[i] = np.flip(x_batch[i], (2, 1))
            y_batch[i] = np.flip(y_batch[i], (1, 0))
        elif flips[i] == 3:
            x_batch[i] = np.flip(x_batch[i], 2)
            y_batch[i] = np.flip(y_batch[i], 1)

    # slope-band multiplicative jitter in un-normalized space
    slope = _unapply_norm(x_batch[..., 10], 10)
    mults = np.clip(rng.normal(1, 0.06, (b, 1, 1, 1)), 0.5, 2)
    x_batch[..., 10] = _apply_norm(slope * mults, 10)

    return x_batch, y_batch
