"""Checkpoint / resume via orbax.

Counterpart of the reference's tf.train.Saver per-epoch directories
named {epoch}-{f1} with a metrics.npy history and resume-from-latest
(reference: src/train/train-model.py:290-323,492-500).
"""
from __future__ import annotations

import os
import re

import numpy as np
import orbax.checkpoint as ocp


def _mgr(directory: str):
    return ocp.CheckpointManager(os.path.abspath(directory))


# Long-lived async checkpointer: saves run on a background thread so
# the training loop's device work overlaps the host serialization
# (tf.train.Saver in the reference blocks the epoch loop).
_ASYNC: ocp.AsyncCheckpointer | None = None


def _async_ckptr() -> ocp.AsyncCheckpointer:
    global _ASYNC
    if _ASYNC is None:
        _ASYNC = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _ASYNC


def wait_for_checkpoints() -> None:
    """Block until every pending async save has committed (call before
    reading a checkpoint back or exiting the process)."""
    if _ASYNC is not None:
        _ASYNC.wait_until_finished()


def save_checkpoint(directory: str, step: int, params, opt_state=None,
                    swa_state=None, metrics: np.ndarray | None = None,
                    f1: float | None = None, async_save: bool = False):
    """Save params (+optimizer/swa) under {directory}/{step}; tag the
    step dir with the f1 like the reference's naming. async_save=True
    returns as soon as device arrays are snapshotted and commits the
    write on a background thread (overlap with the next epoch); the
    sidecar files are written synchronously either way."""
    os.makedirs(directory, exist_ok=True)
    payload = {"params": params}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    if swa_state is not None:
        payload["swa_state"] = swa_state
    path = os.path.join(os.path.abspath(directory), f"step_{step}")
    if async_save:
        ckptr = _async_ckptr()
        ckptr.save(path, args=ocp.args.StandardSave(payload))
    else:
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(path, payload)
    if metrics is not None:
        np.save(os.path.join(directory, "metrics.npy"), metrics)
    if f1 is not None:
        with open(os.path.join(directory, f"step_{step}.f1"), "w") as f:
            f.write(f"{f1:.4f}")


def latest_step(directory: str) -> int | None:
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        m = re.match(r"step_(\d+)$", name)
        if m and os.path.isdir(os.path.join(directory, name)):
            steps.append(int(m.group(1)))
    return max(steps) if steps else None


def load_checkpoint(directory: str, step: int | str | None = None,
                    template=None):
    """Restore a checkpoint: a specific step, the latest (default), or
    the best-by-F1 (`step="best"`, falling back to latest when no .f1
    sidecars exist)."""
    if step == "best":
        step = best_step(directory)
    step = step if step is not None else latest_step(directory)
    if step is None:
        raise FileNotFoundError(f"no checkpoints in {directory}")
    with ocp.StandardCheckpointer() as ckptr:
        path = os.path.join(os.path.abspath(directory), f"step_{step}")
        if template is not None:
            return ckptr.restore(path, template), step
        return ckptr.restore(path), step


def load_params(directory: str, step: int | str | None = None):
    payload, _ = load_checkpoint(directory, step)
    return payload["params"]


def load_metrics(directory: str) -> np.ndarray | None:
    path = os.path.join(directory, "metrics.npy")
    return np.load(path) if os.path.exists(path) else None


def best_step(directory: str) -> int | None:
    """Step with the highest recorded F1 (from the .f1 sidecars the
    saver writes) — the selection the reference's '{epoch}-{f1}' dir
    naming enabled (reference: train-model.py:492-500)."""
    if not os.path.isdir(directory):
        return None
    best = None
    for name in os.listdir(directory):
        m = re.match(r"step_(\d+)\.f1$", name)
        if m:
            # the .f1 sidecar is written synchronously while an async
            # orbax commit may still be in flight (or crashed): only
            # consider steps whose checkpoint dir actually exists, so
            # the production load path never picks an orphaned step
            if not os.path.isdir(
                    os.path.join(directory, f"step_{m.group(1)}")):
                continue
            with open(os.path.join(directory, name)) as f:
                f1 = float(f.read().strip())
            if best is None or f1 > best[1]:
                best = (int(m.group(1)), f1)
    return best[0] if best else None


# --- flat .npz release-weight format -------------------------------------
# The counterpart of the reference's frozen-graph release artifacts
# (models-release/, loaded at download_and_predict_job.py:1784-1826):
# a single self-contained file, no orbax layout needed at inference.

def save_params_npz(path: str, params) -> None:
    import jax

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for p, leaf in flat:
        key = "/".join(k.key for k in p)
        out[key] = np.asarray(leaf)
    np.savez(path, **out)


def load_params_npz(path: str):
    data = np.load(path)
    tree: dict = {}
    for key in data.files:
        node = tree
        parts = key.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = data[key]
    return tree
