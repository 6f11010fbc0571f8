"""DSen2-lite super-resolution model (20 m -> 10 m band sharpening).

Architecture extracted from the released frozen graph
(reference: models-release/supres-40k-swir/superresolve_graph.pb; usage
reference: src/download_and_predict_job.py:95-147):

    h  = relu(conv3x3(x))                 # 10 -> 32, reflect-pad SAME
    h += 0.1 * conv(relu(conv(h)))        # residual block 1
    h += 0.1 * conv(relu(conv(h)))        # residual block 2
    out = bilinear_20m + tanh(conv(h))    # 32 -> 6

All convolutions are 3x3 VALID on 1 px mirror-padded inputs (== SAME
with reflect padding). Inputs: the 10-band patch (20 m bands bilinearly
upsampled) and the upsampled 20 m bands again as the residual base;
output replaces bands 4:10.

TPU-first: the network is fully convolutional, so we run it over whole
(T, H, W, 10) tiles in one batched call instead of the reference's
serial 110x110 window loop — no window seams, one MXU program.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ttc.models.layers import reflect_pad_2d


class _RConv(nn.Module):
    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.he_normal(),
                            (3, 3, x.shape[-1], self.features),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        xp = reflect_pad_2d(x, 1)
        if self.dtype is not None:
            xp = xp.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
        out = jax.lax.conv_general_dilated(
            xp, kernel, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out + bias.astype(out.dtype)


class SuperResolver(nn.Module):
    filters: int = 32
    out_bands: int = 6
    residual_scale: float = 0.1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, bilinear):
        h = jax.nn.relu(_RConv(self.filters, self.dtype, name="in_conv")(x))
        r = jax.nn.relu(_RConv(self.filters, self.dtype, name="b1_conv1")(h))
        h = h + self.residual_scale * _RConv(
            self.filters, self.dtype, name="b1_conv2")(r)
        r = jax.nn.relu(_RConv(self.filters, self.dtype, name="b2_conv1")(h))
        h = h + self.residual_scale * _RConv(
            self.filters, self.dtype, name="b2_conv2")(r)
        delta = jnp.tanh(_RConv(self.out_bands, self.dtype,
                                name="out_conv")(h))
        return bilinear + delta.astype(bilinear.dtype)


# frozen-graph const name -> flax param path
_WEIGHT_MAP = {
    "in_conv/conv2d/kernel": ("in_conv", "kernel"),
    "in_conv/conv2d/bias": ("in_conv", "bias"),
    "01_conv/conv2d_1/kernel": ("b1_conv1", "kernel"),
    "01_conv/conv2d_1/bias": ("b1_conv1", "bias"),
    "02_conv/conv2d_2/kernel": ("b1_conv2", "kernel"),
    "02_conv/conv2d_2/bias": ("b1_conv2", "bias"),
    "11_conv/conv2d_3/kernel": ("b2_conv1", "kernel"),
    "11_conv/conv2d_3/bias": ("b2_conv1", "bias"),
    "12_conv/conv2d_4/kernel": ("b2_conv2", "kernel"),
    "12_conv/conv2d_4/bias": ("b2_conv2", "bias"),
    "out_conv/conv2d_5/kernel": ("out_conv", "kernel"),
    "out_conv/conv2d_5/bias": ("out_conv", "bias"),
}


def params_from_npz(path: str):
    """Load converted frozen-graph weights (tools/convert_sr_weights.py)."""
    raw = np.load(path)
    params: dict = {}
    for const_name, (module, leaf) in _WEIGHT_MAP.items():
        params.setdefault(module, {})[leaf] = jnp.asarray(raw[const_name])
    return {"params": params}


def superresolve_tile(params, stack, model: SuperResolver | None = None):
    """Sharpen bands 4:10 of a (T, H, W, 10+) stack in place-equivalent
    fashion: returns the stack with SR bands written back
    (reference: src/download_and_predict_job.py:95-147, whole-tile
    instead of 110px windows)."""
    model = model or SuperResolver()
    bilinear = stack[..., 4:10]
    resolved = model.apply(params, stack[..., :10], bilinear)
    return stack.at[..., 4:10].set(resolved)
