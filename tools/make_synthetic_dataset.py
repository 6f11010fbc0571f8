"""Generate a synthetic training dataset through the REAL ARD pipeline.

Scenes come from ForestFixtureBackend (known canopy ground truth), run
through process_tile + smooth_tile — the exact code path production
inference uses — then 28x28 monthly patches are cut from the smoothed
cube with 14x14 center labels from the canopy field, normalized with
the production band vectors. Train/test split is by scene so evaluation
is on held-out geography.

Output arrays follow the reference's training-data contract
(reference: src/train/src/data_utils.py:8-69 — monthly (N,12,28,28,17)
normalized x, (N,196) y):

    python tools/make_synthetic_dataset.py --out data/synth \
        --train_scenes 40 --test_scenes 8
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def scene_to_patches(sm, canopy, stride: int = 14, in_size: int = 28,
                     out_size: int = 14):
    """Cut (12, 28, 28, 17) normalized monthly patches + center labels."""
    import numpy as np

    from ttc.core.bands import NORM_MAX, NORM_MIN
    from ttc.infer.windows import normalize

    hw = sm.s2.shape[1]
    dem = sm.dem[None, :, :, None]
    monthly = np.concatenate([
        sm.s2[..., :10],
        np.broadcast_to(dem, (12, hw, hw, 1)),
        sm.s1,
        sm.s2[..., 10:],
    ], axis=-1)
    monthly = np.asarray(normalize(monthly, NORM_MIN, NORM_MAX),
                         np.float32)

    margin = (in_size - out_size) // 2
    xs = []
    ys = []
    for px in range(0, hw - in_size + 1, stride):
        for py in range(0, hw - in_size + 1, stride):
            xs.append(monthly[:, px:px + in_size, py:py + in_size])
            ys.append(canopy[px + margin:px + margin + out_size,
                             py + margin:py + margin + out_size])
    return np.stack(xs), np.stack(ys).astype(np.float32)


FAMILIES = ("forest", "shifted", "random")


def _backend_cls(name: str):
    from ttc.io.forest import (DomainRandomizedBackend,
                               ForestFixtureBackend,
                               ShiftedForestBackend)

    return {"forest": ForestFixtureBackend,
            "shifted": ShiftedForestBackend,
            "random": DomainRandomizedBackend}[name]


def build_split(seeds, hw, n_dates, cloud_fraction, log_every=5,
                families=("forest",)):
    """Scenes cycle round-robin over `families` (the round-5
    domain-randomized training mix: forest + shifted + per-seed
    randomized — see ttc.io.forest)."""
    import numpy as np

    from ttc.preprocess.ard import process_tile, smooth_tile

    all_x, all_y = [], []
    t0 = time.time()
    for i, seed in enumerate(seeds):
        cls = _backend_cls(families[i % len(families)])
        backend = cls(seed=seed, n_dates=n_dates, hw=hw,
                      cloud_fraction=cloud_fraction)
        raw = backend.fetch(0, 0, None, 2023)
        canopy = backend.canopy(0, 0)
        sm = smooth_tile(process_tile(raw))
        x, y = scene_to_patches(sm, canopy)
        all_x.append(x)
        all_y.append(y)
        if (i + 1) % log_every == 0:
            print(f"  scene {i + 1}/{len(seeds)} "
                  f"({time.time() - t0:.0f}s elapsed)", flush=True)
    return np.concatenate(all_x), np.concatenate(all_y)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--train_scenes", type=int, default=40)
    ap.add_argument("--test_scenes", type=int, default=8)
    ap.add_argument("--hw", type=int, default=110)
    ap.add_argument("--n_dates", type=int, default=10)
    ap.add_argument("--cloud_fraction", type=float, default=0.1)
    ap.add_argument("--families", default="forest",
                    help="comma list of scene families to cycle "
                         "(forest, shifted, random)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np  # noqa: F401  (after platform pinning)

    os.makedirs(args.out, exist_ok=True)
    families = tuple(args.families.split(","))
    print(f"building train split (families={families})...", flush=True)
    train_x, train_y = build_split(
        range(100, 100 + args.train_scenes), args.hw, args.n_dates,
        args.cloud_fraction, families=families)
    print("building test split...", flush=True)
    test_x, test_y = build_split(
        range(900, 900 + args.test_scenes), args.hw, args.n_dates,
        args.cloud_fraction, families=families)

    import numpy as np

    # test windows are pre-assembled to the model's 5-step layout
    # (4 quarterly medians + annual median), matching inference
    # (reference: download_and_predict_job.py:1274-1283)
    test_x5 = np.stack([
        np.median(test_x[:, 0:3], axis=1),
        np.median(test_x[:, 3:6], axis=1),
        np.median(test_x[:, 6:9], axis=1),
        np.median(test_x[:, 9:12], axis=1),
        np.median(test_x, axis=1),
    ], axis=1).astype(np.float32)

    np.save(os.path.join(args.out, "train_x.npy"), train_x)
    np.save(os.path.join(args.out, "train_y.npy"),
            train_y.reshape(len(train_y), -1))
    np.save(os.path.join(args.out, "test_x.npy"), test_x5)
    np.save(os.path.join(args.out, "test_y.npy"),
            test_y.reshape(len(test_y), -1))
    print(f"train: {train_x.shape} mean cover "
          f"{train_y.mean():.3f}; test: {test_x.shape} "
          f"mean cover {test_y.mean():.3f}")


if __name__ == "__main__":
    main()
