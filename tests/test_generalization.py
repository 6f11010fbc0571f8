"""Cross-generator generalization gate for the release weights.

The release weights train on ForestFixtureBackend scenes; the held-out
accuracy gate (tests/test_trained_weights.py) evaluates on unseen
seeds of the SAME family. This gate adds a distribution-shifted family
(ttc.io.forest.ShiftedForestBackend: fragmented sharp canopy texture,
phase-shifted phenology, 1.5x band noise, blob clouds, noisier S1
with a calibration offset) and records BOTH numbers, standing in for
the reference's real-data validation loop (reference README.md:15 —
unreproducible in this offline environment).

Measured at gate-writing time (seeds below, CPU):
  in-family  : tolerant F1 0.9964, patch MAE 2.2 pp
  shifted    : tolerant F1 0.9992, patch MAE 5.7 pp
Detection generalizes fully; calibration degrades ~2.6x under the
shift but stays useful — no domain-randomized retrain needed at this
gap (the VERDICT r3 criterion).
"""
import os
import sys

import numpy as np
import pytest

WEIGHTS = os.path.join(os.path.dirname(__file__), "..", "weights",
                       "treecover.npz")

pytestmark = pytest.mark.skipif(not os.path.exists(WEIGHTS),
                                reason="release weights missing")


def _patches(backend_cls, seeds):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from make_synthetic_dataset import scene_to_patches

    from ttc.preprocess.ard import process_tile, smooth_tile

    xs, ys = [], []
    for seed in seeds:
        backend = backend_cls(seed=seed, n_dates=9, hw=70,
                              cloud_fraction=0.1)
        raw = backend.fetch(0, 0, None, 2023)
        sm = smooth_tile(process_tile(raw))
        x, y = scene_to_patches(sm, backend.canopy(0, 0))
        xs.append(x)
        ys.append(y)
    return np.concatenate(xs), np.concatenate(ys)


def _score(monthly, labels):
    import jax

    from ttc.models.metrics import evaluate_predictions
    from ttc.models.unet import TreeCoverNet
    from ttc.train.checkpoint import load_params_npz

    x5 = np.stack([
        np.median(monthly[:, 0:3], axis=1),
        np.median(monthly[:, 3:6], axis=1),
        np.median(monthly[:, 6:9], axis=1),
        np.median(monthly[:, 9:12], axis=1),
        np.median(monthly, axis=1),
    ], axis=1).astype(np.float32)
    params = load_params_npz(WEIGHTS)
    preds = np.asarray(jax.jit(
        lambda p, b: TreeCoverNet().apply(p, b))(params, x5))
    ev = evaluate_predictions(labels, preds)
    ev["mae"] = float(np.abs(preds - labels).mean())
    return ev


def test_shifted_family_generates_distinct_scenes():
    from ttc.io.forest import ForestFixtureBackend, ShiftedForestBackend

    a = ForestFixtureBackend(seed=3, n_dates=6, hw=56).fetch(
        0, 0, None, 2023)
    b = ShiftedForestBackend(seed=3, n_dates=6, hw=56).fetch(
        0, 0, None, 2023)
    assert a.s2_10.shape == b.s2_10.shape
    # the shifted canopy is measurably finer-grained: more edge pixels
    ca = ForestFixtureBackend(seed=3, hw=56, density=0.4).canopy(0, 0)
    cb = ShiftedForestBackend(seed=3, hw=56, density=0.4).canopy(0, 0)
    edges = lambda c: float(np.abs(np.diff(c > 0.5, axis=0)).mean())
    assert edges(cb) > 1.5 * edges(ca), (edges(ca), edges(cb))


def test_domain_randomized_family_varies_per_seed():
    """Every DomainRandomizedBackend seed draws its own generator
    parameters from ranges spanning both fixed families — the
    training-mix side of the round-5 domain-randomized retrain."""
    from ttc.io.forest import DomainRandomizedBackend

    draws = [DomainRandomizedBackend(seed=s, n_dates=6, hw=56)
             for s in range(8)]
    assert len({b.blob_radius for b in draws}) > 2
    assert len({b.cloud_style for b in draws}) == 2
    assert len({round(b.grass_phase, 1) for b in draws}) > 4
    for b in draws:
        assert 3 <= b.blob_radius <= 12
        assert 0.10 <= b.soft <= 0.50
        raw = b.fetch(0, 0, None, 2023)
        assert raw.s2_10.dtype == np.uint16
    # deterministic per seed
    b1 = DomainRandomizedBackend(seed=5)
    b2 = DomainRandomizedBackend(seed=5)
    assert b1.soft == b2.soft and b1.s1_cal == b2.s1_cal


@pytest.mark.slow
def test_generalization_gap_within_budget():
    from ttc.io.forest import ForestFixtureBackend, ShiftedForestBackend

    in_fam = _score(*_patches(ForestFixtureBackend, (970, 971)))
    shifted = _score(*_patches(ShiftedForestBackend, (980, 981)))
    print(f"in-family: F1 {in_fam['f1']:.4f} MAE {in_fam['mae']:.4f}; "
          f"shifted: F1 {shifted['f1']:.4f} MAE {shifted['mae']:.4f}")

    # in-family bar (same as test_trained_weights)
    assert in_fam["f1"] >= 0.97 and in_fam["mae"] <= 0.05
    # shifted-family floor with margin below the measured 0.9992 F1 /
    # 5.7 pp MAE: detection must survive every shifted statistic;
    # calibration may degrade but not collapse
    assert shifted["f1"] >= 0.95, shifted
    assert shifted["mae"] <= 0.10, shifted