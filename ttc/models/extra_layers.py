"""Auxiliary model layers completing the reference layer inventory.

- TemporalAttention: time-axis 1x1-conv attention pooling used by some
  released model variants (reference: src/train/src/model.py:368-375).
- ConvLSTMCell: the unused LSTM alternative to the GRU cell
  (reference: src/train/src/model.py:294-365).
- FeaturePyramidAttention: inference-era FPA block
  (reference: src/layers/extra_layers.py:48-283 family, distilled to
  the pooling-pyramid attention actually defined there).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ttc.models.layers import reflect_pad_2d


class TemporalAttention(nn.Module):
    """Softmax-normalized sigmoid gate over the time axis:
    weighted = sigmoid(conv1x1(x_t)); alpha = weighted / sum_t weighted;
    out = sum_t alpha_t * x_t."""

    units: int

    @nn.compact
    def __call__(self, x_seq):
        # x_seq: (B, T, H, W, C) with C == units
        gate = nn.Conv(self.units, (1, 1), use_bias=False,
                       kernel_init=nn.initializers.ones,
                       name="gate")(x_seq)
        weighted = jax.nn.sigmoid(gate)
        alphas = weighted / jnp.sum(weighted, axis=1, keepdims=True)
        return jnp.sum(alphas * x_seq, axis=1)


class ConvLSTMCell(nn.Module):
    """Convolutional LSTM cell with optional peephole connections."""

    filters: int
    forget_bias: float = 1.0
    peephole: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, state):
        c, h = state
        f = self.filters
        inputs = jnp.concatenate([x, h], axis=-1)
        kernel = self.param("kernel", nn.initializers.glorot_uniform(),
                            (3, 3, inputs.shape[-1], 4 * f), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (4 * f,),
                          jnp.float32)
        y = jax.lax.conv_general_dilated(
            reflect_pad_2d(inputs), kernel, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
        j, i, fg, o = jnp.split(y, 4, axis=-1)
        if self.peephole:
            w_ci = self.param("w_ci", nn.initializers.zeros,
                              c.shape[1:], jnp.float32)
            w_cf = self.param("w_cf", nn.initializers.zeros,
                              c.shape[1:], jnp.float32)
            i = i + w_ci * c
            fg = fg + w_cf * c
        fg = jax.nn.sigmoid(fg + self.forget_bias)
        i = jax.nn.sigmoid(i)
        c_new = c * fg + i * jnp.tanh(j)
        if self.peephole:
            w_co = self.param("w_co", nn.initializers.zeros,
                              c.shape[1:], jnp.float32)
            o = o + w_co * c_new
        o = jax.nn.sigmoid(o)
        h_new = o * jnp.tanh(c_new)
        return h_new, (c_new, h_new)


class FeaturePyramidAttention(nn.Module):
    """Pooling-pyramid attention: global-context gate plus two
    downsampled conv branches merged back at full resolution."""

    features: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        gap = jnp.mean(x, axis=(1, 2), keepdims=True)
        gap = nn.Conv(self.features, (1, 1), name="global")(gap)

        mid = nn.Conv(self.features, (1, 1), name="mid")(x)

        d2 = nn.max_pool(x, (2, 2), strides=(2, 2))
        d2 = nn.Conv(self.features, (3, 3), padding="SAME",
                     name="down2")(d2)
        d4 = nn.max_pool(d2, (2, 2), strides=(2, 2))
        d4 = nn.Conv(self.features, (3, 3), padding="SAME",
                     name="down4")(d4)

        u4 = jax.image.resize(d4, d2.shape, "nearest")
        merged = d2 + u4
        u2 = jax.image.resize(merged, (b, h, w, self.features),
                              "nearest")
        return mid * u2 + gap
