"""Training loop: SAM + AdaBound train step, data-parallel over a mesh.

The reference runs a TF1 session loop with manual SAM double-gradients
(reference: src/train/train-model.py:387-466). Here the whole step —
forward, SAM perturbation, second gradient, AdaBound update — is one
jitted SPMD program: parameters replicated, batch sharded over the
mesh's "tiles" axis, gradient reduction via XLA's automatic psum over
ICI.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ttc.core.config import ModelConfig
from ttc.models.losses import calc_cosine_decay, tree_cover_loss
from ttc.models.unet import TreeCoverNet
from ttc.train.optim import adabound, no_decay_for_gru, sam_gradient


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: Any


def make_loss_fn(model: TreeCoverNet, alpha, keep_rate, rngs):
    def loss_fn(params, batch):
        preds = model.apply(
            params, batch["x"], deterministic=False,
            keep_rate=keep_rate, rngs=rngs)
        return tree_cover_loss(batch["y"], preds, alpha)
    return loss_fn


def init_train_state(rng, mesh: Optional[Mesh] = None,
                     cfg: ModelConfig | None = None,
                     in_size: int = 28, batch_size: int = 32,
                     learning_rate: float = 8e-4):
    """Initialize model params + AdaBound optimizer state.

    Returns (state, step_fn) where step_fn(state, batch, alpha,
    keep_rate, lr_scale, rng) -> (state, metrics).
    """
    cfg = cfg or ModelConfig()
    model = TreeCoverNet(base_filters=cfg.base_filters,
                         zoneout=cfg.zoneout)
    sample = jnp.zeros((1, cfg.length + 1, in_size, in_size, cfg.n_bands),
                       jnp.float32)
    params = jax.jit(model.init)(rng, sample)
    tx = adabound(learning_rate, final_lr=0.1, weight_decay=2e-5,
                  decay_mask=lambda p: no_decay_for_gru(p))
    opt_state = tx.init(params)
    state = TrainState(params=params, opt_state=opt_state,
                       step=jnp.zeros([], jnp.int32))

    def step_fn(state: TrainState, batch, alpha=0.1, keep_rate=0.8,
                rng=None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        step_rng = jax.random.fold_in(rng, state.step)
        k1, k2 = jax.random.split(step_rng)
        loss_fn = make_loss_fn(model, alpha, keep_rate,
                               {"dropblock": k1, "zoneout": k2})
        loss, grads = sam_gradient(lambda p: loss_fn(p, batch),
                                   state.params)
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1)
        return new_state, {"loss": loss,
                           "grad_norm": optax.global_norm(grads)}

    return state, step_fn


def make_sharded_train_step(step_fn: Callable, mesh: Mesh):
    """jit the step with params replicated and the batch sharded over the
    'tiles' (data) axis. XLA inserts the psum over ICI for the gradient
    all-reduce."""
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("tiles"))

    def place(state, batch):
        state = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, repl), state)
        batch = jax.tree_util.tree_map(
            lambda x: jax.device_put(jnp.asarray(x), data), batch)
        return state, batch

    jitted = jax.jit(step_fn)

    def wrapped(state, batch, **kwargs):
        state, batch = place(state, batch)
        new_state, metrics = jitted(state, batch, **kwargs)
        return new_state, jax.tree_util.tree_map(np.asarray, metrics)

    return wrapped


def lr_schedule(cfg: ModelConfig):
    """Cosine decay over cosine_divider epochs with linear warmup
    (reference: train-model.py:397-452)."""
    def schedule(epoch_float: float, warm_up_steps_done: int):
        cosdec = calc_cosine_decay(epoch_float % cfg.cosine_divider,
                                   cfg.cosine_divider, 0)
        lr = cfg.init_lr * cosdec
        if warm_up_steps_done < cfg.warm_up_steps:
            lr = (warm_up_steps_done / cfg.warm_up_steps) * 2e-4
        return lr
    return schedule


def keep_rate_schedule(epoch: int, cosine_divider: int = 75) -> float:
    """DropBlock keep-rate schedule (reference: train-model.py:389-427)."""
    max_keep = 0.5
    if epoch >= 3:
        max_keep = 0.40
    if epoch >= 15:
        max_keep = min(0.45, max_keep)
    if epoch >= 40:
        max_keep = min(0.45, epoch * 0.01)
    cosine_epoch = epoch % cosine_divider
    return float(np.maximum(1.025 - cosine_epoch * 0.025, max_keep))


def alpha_schedule(epoch: int) -> float:
    """Boundary-loss weight ramp (reference: train-model.py:407)."""
    return float(np.minimum(0.01 * (epoch - 1), 0.2))
