"""Export the best checkpoint of a training run as release weights.

Picks the highest-F1 step (the .f1 sidecars save_checkpoint writes,
mirroring the reference's '{epoch}-{f1}' checkpoint-dir naming,
reference: src/train/train-model.py:492-500) and writes the flat .npz
release format every inference entry point loads:

    python tools/export_weights.py --ckpt data/ckpt_r5 \
        --out weights/treecover.npz
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--step", type=int, default=None,
                    help="explicit step (default: best recorded F1)")
    args = ap.parse_args()

    from ttc.train.checkpoint import (best_step, load_params,
                                      save_params_npz)

    step = args.step if args.step is not None else best_step(args.ckpt)
    if step is None:
        raise SystemExit(f"no checkpoints with .f1 sidecars in "
                         f"{args.ckpt}")
    params = load_params(args.ckpt, step)
    save_params_npz(args.out, params)
    with open(os.path.join(args.ckpt, f"step_{step}.f1")) as f:
        f1 = f.read().strip()
    print(f"exported step {step} (F1 {f1}) -> {args.out}")


if __name__ == "__main__":
    main()
