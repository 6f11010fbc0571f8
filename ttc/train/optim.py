"""Optimizers: AdaBound, sharpness-aware minimization, SWA.

- adabound(): optax implementation of the reference's AdaBoundOptimizer
  (reference: src/layers/adabound.py:31-277): Adam moments with the
  effective per-parameter step size clipped into dynamically tightening
  [lower, upper] bounds around final_lr, plus std-scaled decoupled weight
  decay that skips the GRU scope.
- sam_gradient(): two-pass sharpness-aware gradients with
  rho = 0.05 / ||g|| (reference: src/train/train-model.py:258-288).
- SWA: running average of trainable parameters over the fine-tune epochs
  (reference: src/layers/stochastic_weight_averaging.py:10-191), as a
  pure pytree accumulator.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class AdaBoundState(NamedTuple):
    count: jnp.ndarray
    m: Any
    v: Any


def adabound(learning_rate: float | Callable, final_lr: float = 0.1,
             b1: float = 0.9, b2: float = 0.999, gamma: float = 1e-3,
             eps: float = 1e-8, weight_decay: float = 2e-5,
             decay_mask: Optional[Callable] = None
             ) -> optax.GradientTransformation:
    """AdaBound as an optax GradientTransformation.

    The update is
        step  = lr * sqrt(1 - b2^t) / (1 - b1^t)
        bound = clip(step / (sqrt(v) + eps),
                     final_lr_t * (1 - 1/(gamma*t + 1)),
                     final_lr_t * (1 + 1/(gamma*t)))
        p    -= m * bound  [+ wd * std(p) * p for decayed params]
    where final_lr_t = final_lr * lr / base_lr tracks LR schedules.
    """
    base_lr = learning_rate(0) if callable(learning_rate) else learning_rate

    def init_fn(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return AdaBoundState(count=jnp.zeros([], jnp.int32),
                             m=zeros,
                             v=jax.tree_util.tree_map(jnp.zeros_like,
                                                      params))

    def update_fn(updates, state, params):
        count = state.count + 1
        t = count.astype(jnp.float32)
        lr = learning_rate(count) if callable(learning_rate) \
            else learning_rate
        m = jax.tree_util.tree_map(
            lambda mu, g: b1 * mu + (1 - b1) * g, state.m, updates)
        v = jax.tree_util.tree_map(
            lambda nu, g: b2 * nu + (1 - b2) * g * g, state.v, updates)

        step_size = lr * jnp.sqrt(1 - b2 ** t) / (1 - b1 ** t)
        final_lr_t = final_lr * lr / base_lr
        gm = gamma * t
        lower = final_lr_t * (1.0 - 1.0 / (gm + 1.0))
        upper = final_lr_t * (1.0 + 1.0 / gm)

        def _delta(mu, nu, p, decayed):
            bounded = jnp.clip(step_size / (jnp.sqrt(nu) + eps),
                               lower, upper)
            d = mu * bounded
            if decayed and weight_decay:
                axes = tuple(range(max(p.ndim - 1, 1))) if p.ndim > 1 \
                    else (0,)
                std = jnp.std(p, axis=axes, keepdims=True)
                d = d + weight_decay * std * p
            return -d

        if decay_mask is None:
            mask = jax.tree_util.tree_map(lambda _: True, params)
        else:
            mask = decay_mask(params)
        deltas = jax.tree_util.tree_map(_delta, m, v, params, mask)
        return deltas, AdaBoundState(count=count, m=m, v=v)

    return optax.GradientTransformation(init_fn, update_fn)


def no_decay_for_gru(params):
    """Weight-decay mask skipping the GRU scope, mirroring the reference's
    exclusion of the 'down_16' variable scope."""
    def walk(tree, in_gru):
        if isinstance(tree, dict):
            return {k: walk(v, in_gru or k == "gru")
                    for k, v in tree.items()}
        return not in_gru

    return walk(params, False)


def sam_gradient(loss_fn: Callable, params, rho: float = 0.05,
                 eps: float = 1e-12):
    """Two-pass SAM: returns (loss_at_params, grads_at_perturbed).

    loss_fn: params -> scalar loss.
    """
    loss, grads = jax.value_and_grad(loss_fn)(params)
    norm = optax.global_norm(grads)
    scale = rho / (norm + eps)
    noised = jax.tree_util.tree_map(lambda p, g: p + g * scale,
                                    params, grads)
    sam_grads = jax.grad(loss_fn)(noised)
    return loss, sam_grads


class SWAState(NamedTuple):
    n_models: jnp.ndarray
    average: Any


def swa_init(params) -> SWAState:
    return SWAState(n_models=jnp.zeros([], jnp.float32),
                    average=jax.tree_util.tree_map(jnp.zeros_like, params))


def swa_update(state: SWAState, params) -> SWAState:
    """average <- (average * n + params) / (n + 1)."""
    n = state.n_models
    avg = jax.tree_util.tree_map(
        lambda a, p: (a * n + p) / (n + 1.0), state.average, params)
    return SWAState(n_models=n + 1.0, average=avg)


class AdaBeliefState(NamedTuple):
    count: jnp.ndarray
    m: Any
    s: Any
    smax: Any


def adabelief(learning_rate: float | Callable, b1: float = 0.9,
              b2: float = 0.999, eps: float = 1e-14,
              weight_decay: float = 0.0, rectify: bool = True,
              amsgrad: bool = False, sma_threshold: float = 5.0
              ) -> optax.GradientTransformation:
    """AdaBelief (Zhuang et al. 2020): Adam with the second moment
    tracking the *belief* (g - m)^2, optional RAdam-style rectification
    (reference: src/layers/adabelief.py:14-376 semantics)."""

    def init_fn(params):
        z = jax.tree_util.tree_map(jnp.zeros_like, params)
        return AdaBeliefState(count=jnp.zeros([], jnp.int32), m=z,
                              s=jax.tree_util.tree_map(jnp.zeros_like,
                                                       params),
                              smax=jax.tree_util.tree_map(
                                  jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        count = state.count + 1
        t = count.astype(jnp.float32)
        lr = learning_rate(count) if callable(learning_rate) \
            else learning_rate
        m = jax.tree_util.tree_map(
            lambda mu, g: b1 * mu + (1 - b1) * g, state.m, updates)
        s = jax.tree_util.tree_map(
            lambda nu, g, mu: b2 * nu + (1 - b2) * (g - mu) ** 2 + eps,
            state.s, updates, m)
        if amsgrad:
            smax = jax.tree_util.tree_map(jnp.maximum, state.smax, s)
            denom_src = smax
        else:
            smax = state.smax
            denom_src = s

        m_hat_scale = 1.0 / (1 - b1 ** t)
        s_hat_scale = 1.0 / (1 - b2 ** t)

        if rectify:
            sma_inf = 2.0 / (1 - b2) - 1.0
            sma = sma_inf - 2.0 * t * (b2 ** t) / (1 - b2 ** t)
            r_t = jnp.sqrt(jnp.maximum(
                (sma - 4) * (sma - 2) * sma_inf
                / jnp.maximum((sma_inf - 4) * (sma_inf - 2) * sma, 1e-12),
                0.0))
            use_adaptive = sma >= sma_threshold
        else:
            r_t = 1.0
            use_adaptive = True

        def _delta(mu, nu, p):
            m_hat = mu * m_hat_scale
            denom = jnp.sqrt(nu * s_hat_scale) + eps
            adaptive = r_t * m_hat / denom
            sgd = m_hat
            step = jnp.where(use_adaptive, adaptive, sgd) if rectify \
                else adaptive
            if weight_decay and p is not None:
                step = step + weight_decay * p
            return -lr * step

        deltas = jax.tree_util.tree_map(_delta, m, denom_src,
                                        params if params is not None
                                        else m)
        return deltas, AdaBeliefState(count=count, m=m, s=s, smax=smax)

    return optax.GradientTransformation(init_fn, update_fn)
