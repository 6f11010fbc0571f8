"""Checkpoint save/restore, latest/best-step selection, npz release
format (reference: src/train/train-model.py:290-323,492-500)."""
import numpy as np

from ttc.train.checkpoint import (best_step, latest_step,
                                  load_checkpoint, load_metrics,
                                  load_params, load_params_npz,
                                  save_checkpoint, save_params_npz)


def _params(seed):
    rng = np.random.default_rng(seed)
    return {"layer": {"kernel": rng.random((3, 4), np.float32),
                      "bias": rng.random((4,), np.float32)}}


def test_roundtrip_latest_and_best(tmp_path):
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, 1, _params(1), f1=0.50,
                    metrics=np.array([0.5]))
    save_checkpoint(d, 2, _params(2), f1=0.83)
    save_checkpoint(d, 3, _params(3), f1=0.71)

    assert latest_step(d) == 3
    assert best_step(d) == 2

    # default load = latest
    payload, step = load_checkpoint(d)
    assert step == 3
    np.testing.assert_array_equal(payload["params"]["layer"]["kernel"],
                                  _params(3)["layer"]["kernel"])
    # step="best" = highest F1
    best = load_params(d, step="best")
    np.testing.assert_array_equal(best["layer"]["bias"],
                                  _params(2)["layer"]["bias"])
    assert load_metrics(d) is not None


def test_best_falls_back_to_latest_without_sidecars(tmp_path):
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, 5, _params(5))  # no f1 tag
    assert best_step(d) is None
    _, step = load_checkpoint(d, step="best")
    assert step == 5


def test_npz_release_roundtrip(tmp_path):
    p = str(tmp_path / "release.npz")
    params = {"a": {"b": np.arange(6, dtype=np.float32).reshape(2, 3)},
              "c": np.ones(2, np.float32)}
    save_params_npz(p, params)
    back = load_params_npz(p)
    np.testing.assert_array_equal(back["a"]["b"], params["a"]["b"])
    np.testing.assert_array_equal(back["c"], params["c"])


def test_async_save_commits_and_roundtrips(tmp_path):
    from ttc.train.checkpoint import wait_for_checkpoints

    d = str(tmp_path / "ckpt_async")
    save_checkpoint(d, 7, _params(7), f1=0.91, async_save=True)
    wait_for_checkpoints()
    assert latest_step(d) == 7
    assert best_step(d) == 7
    back = load_params(d)
    np.testing.assert_array_equal(back["layer"]["kernel"],
                                  _params(7)["layer"]["kernel"])
