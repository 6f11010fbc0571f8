"""Evaluate a candidate release-weight file against the quality gates
BEFORE swapping it in: in-family + shifted-family + domain-randomized
tolerant F1 / patch MAE (the round-5 domain-randomized retrain
acceptance: shifted patch MAE <= 3 pp with in-family quality
preserved), on the same held-out seeds the test gates use.

    python tools/eval_weights.py --weights /tmp/candidate.npz [--cpu]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "tools"))


def _patches(backend_cls, seeds):
    import numpy as np

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


def _score(weights, monthly, labels):
    import jax
    import numpy as np

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
    params = load_params_npz(weights)
    preds = np.asarray(jax.jit(
        lambda p, b: TreeCoverNet().apply(p, b))(params, x5))
    ev = evaluate_predictions(labels, preds)
    ev["mae"] = float(np.abs(preds - labels).mean())
    return {"f1": round(float(ev["f1"]), 4),
            "mae": round(ev["mae"], 4)}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--weights", required=True)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    global np
    import numpy as np

    from ttc.io.forest import (DomainRandomizedBackend,
                               ForestFixtureBackend,
                               ShiftedForestBackend)

    out = {}
    for name, cls, seeds in (
            ("in_family", ForestFixtureBackend, (970, 971)),
            ("shifted", ShiftedForestBackend, (980, 981)),
            ("randomized_heldout", DomainRandomizedBackend,
             (990, 991))):
        out[name] = _score(args.weights, *_patches(cls, seeds))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
