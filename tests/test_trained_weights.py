"""Accuracy of the release weights (weights/treecover.npz) on held-out
canopy-structured scenes generated through the REAL ARD pipeline.

The weights were trained by ttc.cli.train_job on 40 ForestFixture
scenes (seeds 100-139); these tests evaluate on disjoint seeds, so they
measure generalization, not memorization. Recorded release quality:
tolerant F1 0.9954 / 2.2 pp patch MAE on the held-out split; ~3.9 pp
raster deviation end-to-end (see tests/test_golden_regression.py for
the e2e bar).

Counterpart of the reference's eval gate
(reference: src/train/src/losses.py:277-379 calculate_metrics).
"""
import os

import numpy as np
import pytest

WEIGHTS = os.path.join(os.path.dirname(__file__), "..", "weights",
                       "treecover.npz")

pytestmark = pytest.mark.skipif(not os.path.exists(WEIGHTS),
                                reason="release weights missing")


@pytest.fixture(scope="module")
def heldout_patches():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from make_synthetic_dataset import scene_to_patches

    from ttc.io.forest import ForestFixtureBackend
    from ttc.preprocess.ard import process_tile, smooth_tile

    xs, ys = [], []
    for seed in (970, 971):
        backend = ForestFixtureBackend(seed=seed, n_dates=9, hw=70,
                                       cloud_fraction=0.1)
        raw = backend.fetch(0, 0, None, 2023)
        sm = smooth_tile(process_tile(raw))
        x, y = scene_to_patches(sm, backend.canopy(0, 0))
        xs.append(x)
        ys.append(y)
    return np.concatenate(xs), np.concatenate(ys)


@pytest.mark.slow
def test_release_weights_accuracy(heldout_patches):
    import jax

    from ttc.models.metrics import evaluate_predictions
    from ttc.models.unet import TreeCoverNet
    from ttc.train.checkpoint import load_params_npz

    monthly, labels = heldout_patches
    # assemble the model's 5-step layout (quarterly + annual medians)
    x5 = np.stack([
        np.median(monthly[:, 0:3], axis=1),
        np.median(monthly[:, 3:6], axis=1),
        np.median(monthly[:, 6:9], axis=1),
        np.median(monthly[:, 9:12], axis=1),
        np.median(monthly, axis=1),
    ], axis=1).astype(np.float32)

    params = load_params_npz(WEIGHTS)
    model = TreeCoverNet()
    preds = np.asarray(jax.jit(
        lambda p, b: model.apply(p, b))(params, x5))

    ev = evaluate_predictions(labels, preds)
    mae = float(np.abs(preds - labels).mean())
    assert ev["f1"] >= 0.97, f"tolerant F1 {ev['f1']:.4f}"
    assert mae <= 0.05, f"patch MAE {mae:.4f}"
