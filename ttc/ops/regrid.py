"""Temporal regridding: irregular date stack -> fixed biweekly grid.

The reference's `calculate_and_save_best_images`
(reference: src/downloading/utils.py:176-347) builds, for each of 24
biweekly target steps, a weighted sum of up to 2 prior and 2 later
acquisitions with inverse-distance weights and year-wraparound handling,
executed as a Python loop of fancy-indexed numpy sums.

TPU-first design: the *weights* depend only on the (tiny) date vector, so
we precompute a (n_steps, T) matrix W on the host with exactly the
reference's selection/weighting semantics, then regrid on device as a
single contraction

    out[s, h, w, c] = sum_t W[s, t] * data[t, h, w, c]

which XLA maps to one MXU matmul over (T, H*W*C). Invalid date slots get
zero weight, making the op safe for fixed-capacity masked stacks.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

BIWEEKLY_STEPS = np.arange(0, 360, 15)


def regrid_weights(doy: np.ndarray, valid: np.ndarray | None = None,
                   n_steps: int = 24, interval: int = 15
                   ) -> tuple[np.ndarray, int]:
    """Weight matrix (n_steps, T) and maximum temporal gap in days.

    Replicates the prior/after selection, wraparound flags, inverse-distance
    multipliers, duplicate-date index semantics, and normalization of the
    reference implementation. `valid` marks occupied slots of a
    fixed-capacity stack; invalid slots receive weight 0.
    """
    doy = np.asarray(doy, dtype=np.int64)
    if valid is None:
        valid = np.ones_like(doy, dtype=bool)
    valid = np.asarray(valid, dtype=bool)
    t_total = doy.shape[0]
    idx_valid = np.flatnonzero(valid)
    dates = doy[idx_valid].astype(np.float64)
    # negative "previous year" dates wrap into [0, 365)
    dates = np.where(dates < -100, dates % 365, dates)
    if dates.size == 0:
        raise ValueError("regrid_weights: no valid dates")

    steps = np.arange(0, n_steps * interval, interval)
    weights = np.zeros((n_steps, t_total), dtype=np.float32)
    max_distance = 0

    for si, step in enumerate(steps):
        distances = dates - step

        prior = distances[distances < 5][-2:]
        if prior.shape[0] > 0:
            prior = prior[prior > (-100 + np.max(prior))]
        after = distances[distances >= -5][:2]
        if after.shape[0] > 0:
            after = after[after < (100 + np.min(after))]

        prior_flag = 0
        after_flag = 0
        if len(prior) == 0:
            if np.min(dates) >= 90:
                prior = distances[-1:]
                prior_flag = 365
            else:
                prior = after
        if len(after) == 0:
            if np.max(dates) <= 270:
                after = distances[:1]
                after_flag = 365
            else:
                after = prior

        prior_calc = np.maximum(np.abs(prior - prior_flag), 1.0)
        after_calc = np.maximum(np.abs(after + after_flag), 1.0)

        total = np.sum(np.concatenate([prior_calc, after_calc]))
        if total == 0:
            prior_calc = prior_calc + 1
            after_calc = after_calc + 1
        closest = max(abs(prior_calc[-1]) + abs(after_calc[0]), 2.0)

        prior_mults = np.abs(1 - prior_calc / closest)
        after_mults = np.abs(1 - after_calc / closest)
        if len(prior_mults) == 2:
            prior_mults[0] = abs(
                (prior_calc[1] / prior_calc[0]) * prior_mults[1])
        if len(after_mults) == 2:
            after_mults[1] = abs(
                (after_calc[0] / after_calc[1]) * after_mults[0])

        divisor = np.sum(np.abs(prior_mults)) + np.sum(np.abs(after_mults))
        prior_ratio = prior_mults / divisor
        after_ratio = after_mults / divisor

        # Duplicate-date semantics: indices of *all* dates matching the
        # selected prior/after dates, deduped + sorted, capped to 2 from
        # the near end; broadcasting against the ratio vector follows
        # numpy rules (reference: src/downloading/utils.py:280-334).
        prior_dates = step + prior
        after_dates = step + after
        p_idx = sorted({i for i, v in enumerate(dates) if v in prior_dates})
        a_idx = sorted({i for i, v in enumerate(dates) if v in after_dates})
        p_idx = p_idx[:2]
        a_idx = a_idx[-2:]

        _accumulate(weights[si], idx_valid, p_idx, prior_ratio)
        _accumulate(weights[si], idx_valid, a_idx, after_ratio)

        # Track the widest bracketing gap (reference: utils.py:304-311).
        all_dates = np.concatenate([prior_dates, after_dates])
        if len(all_dates) == 2:
            dist = np.min(all_dates[1]) - np.max(all_dates[0])
            max_distance = max(max_distance, int(dist))

    return weights, max_distance


def _accumulate(row: np.ndarray, idx_valid: np.ndarray, sel: list,
                ratio: np.ndarray) -> None:
    """Scatter-add ratios onto weight row with numpy-broadcast pairing."""
    n_sel, n_r = len(sel), len(ratio)
    if n_sel == 0:
        return
    if n_sel == n_r:
        for i, r in zip(sel, ratio):
            row[idx_valid[i]] += r
    elif n_r == 1:
        # one ratio, several duplicate images: each image gets the ratio
        for i in sel:
            row[idx_valid[i]] += ratio[0]
    elif n_sel == 1:
        # one image, several ratios: image gets the sum
        row[idx_valid[sel[0]]] += np.sum(ratio)
    else:  # pragma: no cover - capped at 2 each by construction
        for i, r in zip(sel, ratio):
            row[idx_valid[i]] += r


def apply_regrid(data, weights):
    """Contract (T, H, W, C) with (S, T) -> (S, H, W, C) on the MXU."""
    w = jnp.asarray(weights, dtype=data.dtype)
    # full fp32 accumulation: the T axis is tiny, so "highest" costs
    # nothing but keeps bit-level parity with the reference
    return jnp.einsum("st,thwc->shwc", w, data, precision="highest",
                      preferred_element_type=jnp.float32)
