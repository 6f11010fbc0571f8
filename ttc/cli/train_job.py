"""Model training job.

Counterpart of the reference's train-model.py epoch loop
(reference: src/train/train-model.py:110-502): stratified equibatches,
augmentation, SAM+AdaBound steps with cosine/warmup LR, DropBlock
keep-rate and boundary-loss alpha schedules, SWA + Nesterov fine-tune
over the last 15 epochs, tolerant-F1 checkpoint selection, orbax
checkpoints, data-parallel over the available device mesh.

Usage:
    python -m ttc.cli.train_job --train_x train_x.npy --train_y ... \
        --checkpoint_dir ckpt/ [--epochs 100]
"""
from __future__ import annotations

import argparse
import functools
import logging

import jax
import numpy as np

from ttc.core.config import ModelConfig
from ttc.models.metrics import evaluate_predictions
from ttc.models.unet import TreeCoverNet
from ttc.parallel.mesh import make_mesh
from ttc.train.checkpoint import (
    latest_step,
    load_checkpoint,
    save_checkpoint,
    wait_for_checkpoints,
)
from ttc.train.data import augment_batch, equibatch
from ttc.train.loop import (
    TrainState,
    alpha_schedule,
    init_train_state,
    keep_rate_schedule,
    make_sharded_train_step,
)
from ttc.train.optim import swa_init, swa_update

log = logging.getLogger("ttc.train_job")


@functools.lru_cache(maxsize=4)
def _eval_forward(model):
    # one jitted forward per model config: re-jitting a fresh lambda
    # every eval call re-traces and re-loads the executable each epoch
    # (~30 s/epoch through the axon tunnel's server-side compile path)
    return jax.jit(lambda p, b: model.apply(p, b))


def evaluate(model, params, test_x, test_y, batch: int = 32):
    """test_x may be a numpy array or an on-device jax array; passing
    `jax.device_put(test_x)` amortizes the test-set upload across the
    whole epoch loop (it dominates eval wall time on slow host links)."""
    preds = []
    fwd = _eval_forward(model)
    for i in range(0, len(test_x), batch):
        xb = test_x[i:i + batch]
        preds.append(np.asarray(fwd(params, xb)))
    preds = np.concatenate(preds)
    return evaluate_predictions(test_y, preds)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--train_x", required=True)
    parser.add_argument("--train_y", required=True)
    parser.add_argument("--test_x", required=True)
    parser.add_argument("--test_y", required=True)
    parser.add_argument("--checkpoint_dir", default="ckpt/")
    parser.add_argument("--epochs", type=int, default=100)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)
    from ttc.utils.logging import setup_logging
    setup_logging()
    from ttc.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    cfg = ModelConfig(n_epochs=args.epochs, batch_size=args.batch_size)
    # monthly training tensor: (N, 12, 28, 28, 17), already normalized
    train_x = np.load(args.train_x, mmap_mode="r")
    train_y = np.load(args.train_y)
    test_x = np.asarray(np.load(args.test_x), np.float32)
    test_y = np.asarray(np.load(args.test_y), np.float32)
    if test_y.ndim != 3 or test_y.shape[-1] != cfg.out_size:
        test_y = test_y.reshape(-1, cfg.out_size, cfg.out_size)
    # upload the test set once; per-epoch eval then only moves params
    # and the small prediction readback over the host link
    test_x = jax.device_put(test_x)

    mesh = make_mesh()
    model = TreeCoverNet(base_filters=cfg.base_filters,
                         zoneout=cfg.zoneout)
    state, step_fn = init_train_state(jax.random.PRNGKey(args.seed),
                                      cfg=cfg,
                                      batch_size=cfg.batch_size,
                                      learning_rate=cfg.init_lr)
    step = make_sharded_train_step(step_fn, mesh)

    start_epoch = 1
    metrics = np.zeros((6, 300), np.float32)
    if args.resume and latest_step(args.checkpoint_dir) is not None:
        payload, ckpt_step = load_checkpoint(
            args.checkpoint_dir,
            template={"params": state.params,
                      "opt_state": state.opt_state})
        state = TrainState(params=payload["params"],
                           opt_state=payload["opt_state"],
                           step=state.step)
        start_epoch = ckpt_step + 1
        log.info("resumed from epoch %d", ckpt_step)

    swa = swa_init(state.params)
    rng = np.random.default_rng(args.seed)
    best_f1 = 0.0
    warm_steps_done = 0

    for epoch in range(start_epoch, cfg.n_epochs):
        fine_tune = epoch > cfg.n_epochs - 15
        keep_rate = keep_rate_schedule(epoch, cfg.cosine_divider)
        alpha = alpha_schedule(epoch)
        order = equibatch(list(range(len(train_y))), train_y, rng)

        losses = []
        n_batches = len(order) // cfg.batch_size
        for k in range(n_batches):
            ids = order[k * cfg.batch_size:(k + 1) * cfg.batch_size]
            xb, yb = augment_batch(ids, train_x, train_y,
                                   length=cfg.length,
                                   in_size=cfg.in_size,
                                   out_size=cfg.out_size, rng=rng)
            warm_steps_done += 1
            state, m = step(state, {"x": xb, "y": yb}, alpha=alpha,
                            keep_rate=keep_rate,
                            rng=jax.random.PRNGKey(args.seed + epoch))
            losses.append(float(m["loss"]))

        metrics[0, epoch] = np.mean(losses) if losses else 0.0
        log.info("epoch %d: loss %.4f keep %.2f alpha %.2f%s", epoch,
                 metrics[0, epoch], keep_rate, alpha,
                 " [SWA/fine-tune]" if fine_tune else "")

        eval_params = state.params
        if fine_tune:
            swa = swa_update(swa, state.params)
            eval_params = swa.average

        ev = evaluate(model, eval_params, test_x, test_y)
        metrics[2, epoch] = ev["error"]
        metrics[5, epoch] = ev["f1"]
        log.info("epoch %d: F1 %.3f (thresh %.2f) error %.2f", epoch,
                 ev["f1"], ev["threshold"], ev["error"])

        # save EVERY epoch (async: the write commits on a background
        # thread while the next epoch's device work proceeds).
        # Selection still picks the best F1 via the .f1 sidecars;
        # unconditional saves make crash-resume lossless across the
        # mid-schedule regularization valley, where the old
        # `f1 > best - 0.02` gate could go dozens of epochs without
        # writing a resumable step.
        save_checkpoint(args.checkpoint_dir, epoch,
                        eval_params, opt_state=state.opt_state,
                        metrics=metrics, f1=ev["f1"],
                        async_save=True)
        best_f1 = max(best_f1, ev["f1"])

    wait_for_checkpoints()
    # final save carries its F1 sidecar so best_step() can consider it
    save_checkpoint(args.checkpoint_dir, cfg.n_epochs, state.params,
                    opt_state=state.opt_state, metrics=metrics,
                    f1=float(metrics[5, cfg.n_epochs - 1]))


if __name__ == "__main__":
    main()
