"""Building-block layers for the ConvGRU U-Net.

Faithful functional re-implementations of the reference's TF1 layers
(reference: src/train/src/model.py, src/layers/*.py) with their exact
inference semantics:

- WSConv2D: weight standardization (zero-mean / unit-std kernel over
  spatial+input axes) applied at call time (model.py:380-394).
- partial_conv: border-aware SAME conv — output scaled by
  k^2 / (ones-conv) so edge pixels see a full-window average
  (model.py:396-444).
- group_norm / weighted_group_norm: GN with G=8 contiguous channel
  groups and per-channel gamma/beta; the weighted variant uses the
  DropBlock mask as moment weights (model.py:100-148).
- sSE: spatial squeeze-excitation (1x1 sigmoid conv gate). The
  reference's "csse_block" reduces to sSE only — the channel branch is
  commented out (model.py:64-82).
- DropBlock: split into mask generation and application so one mask can
  feed both weighted GN and the drop (model.py:633-724). Identity at
  inference.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def standardize_kernel(kernel, eps: float = 1e-5):
    """Zero-mean, unit-std normalize a (kh, kw, cin, cout) kernel over
    (kh, kw, cin). Population std, matching keras.backend.std."""
    mean = jnp.mean(kernel, axis=(0, 1, 2), keepdims=True)
    kernel = kernel - mean
    std = jnp.std(kernel, axis=(0, 1, 2), keepdims=True)
    return kernel / (std + eps)


class WSConv(nn.Module):
    """Weight-standardized 2D convolution (NHWC)."""

    features: int
    kernel_size: int = 3
    padding: str = "SAME"
    use_bias: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.he_normal(), (k, k, cin, self.features),
            jnp.float32)
        kernel = standardize_kernel(kernel)
        if self.dtype is not None:
            kernel = kernel.astype(self.dtype)
            x = x.astype(self.dtype)
        out = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1, 1), padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            out = out + bias.astype(out.dtype)
        return out


def partial_conv_ratio(h: int, w: int, kernel: int = 3):
    """SAME-conv border rescale: k^2 / conv(ones). Depends only on the
    static spatial shape, so XLA constant-folds it."""
    ones = jnp.ones((1, h, w, 1), jnp.float32)
    kern = jnp.ones((kernel, kernel, 1, 1), jnp.float32)
    update = jax.lax.conv_general_dilated(
        ones, kern, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ratio = (kernel * kernel) / (update + 1e-8)
    return ratio * jnp.clip(update, 0.0, 1.0)


class PartialWSConv(nn.Module):
    """partial_conv: WSConv; for SAME padding the output is multiplied by
    the border mask ratio (reference: model.py:396-444)."""

    features: int
    kernel_size: int = 3
    padding: str = "SAME"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        out = WSConv(self.features, self.kernel_size, self.padding,
                     use_bias=False, dtype=self.dtype, name="ws")(x)
        if self.padding.upper() == "SAME":
            h, w = x.shape[-3], x.shape[-2]
            out = out * partial_conv_ratio(h, w, self.kernel_size).astype(
                out.dtype)
        return out


class GroupNorm(nn.Module):
    """GN over contiguous channel blocks with per-channel gamma/beta.

    Moments are computed in fp32 regardless of compute dtype.
    """

    groups: int = 8
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, weight=None):
        c = x.shape[-1]
        g = min(self.groups, c)
        per = c // g
        gamma = self.param("gamma", nn.initializers.ones, (c,), jnp.float32)
        beta = self.param("beta", nn.initializers.zeros, (c,), jnp.float32)

        # Channel-wise partial sums first, groups combined on (B, C)
        # scalars: avoids the 5-D reshape of the activation tensor
        # (2.5x faster on TPU than reducing over (H, W, C//G) directly).
        orig_dtype = x.dtype
        xf = x.astype(jnp.float32)
        b, h, w = xf.shape[0], xf.shape[1], xf.shape[2]
        if weight is None:
            s = jnp.sum(xf, axis=(1, 2))                   # (B, C)
            ss = jnp.sum(xf * xf, axis=(1, 2))
            n = jnp.float32(h * w * per)
            sg = s.reshape(b, g, per).sum(-1)              # (B, G)
            ssg = ss.reshape(b, g, per).sum(-1)
            mean = sg / n
            var = ssg / n - mean * mean
        else:
            wf = weight.astype(jnp.float32)
            s = jnp.sum(xf * wf, axis=(1, 2))
            ss = jnp.sum(xf * xf * wf, axis=(1, 2))
            sw = jnp.sum(wf, axis=(1, 2))
            sg = s.reshape(b, g, per).sum(-1)
            ssg = ss.reshape(b, g, per).sum(-1)
            n = jnp.maximum(sw.reshape(b, g, per).sum(-1), 1e-8)
            mean = sg / n
            var = ssg / n - mean * mean

        inv = jax.lax.rsqrt(var + self.eps)                # (B, G)
        inv_c = jnp.repeat(inv, per, axis=1)               # (B, C)
        mean_c = jnp.repeat(mean, per, axis=1)
        scale = inv_c * gamma[None]
        bias = beta[None] - mean_c * scale
        out = xf * scale[:, None, None, :] + bias[:, None, None, :]
        return out.astype(orig_dtype)


class SpatialSE(nn.Module):
    """sSE gate: sigmoid(1x1 conv to one channel) * x."""

    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        gate = nn.Conv(1, (1, 1), use_bias=self.use_bias,
                       kernel_init=nn.initializers.he_normal(),
                       name="conv")(x)
        return x * jax.nn.sigmoid(gate)


def dropblock_mask(rng, shape, keep_prob, block_size: int):
    """DropBlock mask of `shape` = (B, H, W, C): 1 = keep, 0 = dropped
    block (reference: model.py:630-685). Returns all-ones when
    keep_prob >= 1."""
    b, h, w, c = shape
    gamma = ((1.0 - keep_prob) * (w * h) / (block_size ** 2)
             / ((w - block_size + 1) * (h - block_size + 1)))
    seed_shape = (b, h - block_size + 1, w - block_size + 1, c)
    seeds = jax.random.uniform(rng, seed_shape) < gamma
    p1 = (block_size - 1) // 2
    p0 = (block_size - 1) - p1
    seeds = jnp.pad(seeds.astype(jnp.float32),
                    ((0, 0), (p0, p1), (p0, p1), (0, 0)))
    expanded = jax.lax.reduce_window(
        seeds, -jnp.inf, jax.lax.max, (1, block_size, block_size, 1),
        (1, 1, 1, 1), "SAME")
    return 1.0 - jnp.clip(expanded, 0.0, 1.0)


def apply_dropblock(x, mask):
    """x * mask, rescaled by size/sum of the mask (model.py:688-724)."""
    scale = mask.size / jnp.maximum(jnp.sum(mask), 1.0)
    return x * mask * scale


class ConvSwishGN(nn.Module):
    """The standard conv block: partial WSConv -> swish -> [dropblock
    mask] -> weighted GN -> sSE -> [dropblock apply]
    (reference: model.py:448-538).

    At inference (deterministic=True) the dropblock mask is all-ones, so
    weighted GN reduces to plain GN and the drop is identity.
    """

    features: int
    kernel_size: int = 3
    padding: str = "SAME"
    block_size: int = 5
    use_norm: bool = True
    use_csse: bool = True
    use_dropblock: bool = True
    activation: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True, keep_rate: float = 1.0):
        out = PartialWSConv(self.features, self.kernel_size, self.padding,
                            dtype=self.dtype, name="conv")(x)
        if self.activation:
            out = jax.nn.swish(out)

        mask = None
        # keep_rate may be a traced scalar (the schedule feeds it into
        # the jitted train step); at keep_rate=1 gamma=0 so the mask is
        # all-ones and dropblock is identity — no Python branch needed.
        use_drop = self.use_dropblock and not deterministic
        if use_drop:
            rng = self.make_rng("dropblock")
            mask = dropblock_mask(rng, out.shape, keep_rate, self.block_size)

        if self.use_norm:
            out = GroupNorm(groups=8, name="norm")(out, weight=mask)
        if self.use_csse:
            out = SpatialSE(name="csse")(out)
        if use_drop:
            out = apply_dropblock(out, mask)
        return out


def reflect_pad_2d(x, pad: int = 1):
    """REFLECT pad the two spatial axes of (..., H, W, C)."""
    cfg = [(0, 0)] * (x.ndim - 3) + [(pad, pad), (pad, pad), (0, 0)]
    return jnp.pad(x, cfg, mode="reflect")


def upsample_nearest_2d(x, factor: int = 2):
    x = jnp.repeat(x, factor, axis=-3)
    return jnp.repeat(x, factor, axis=-2)


def crop_2d(x, crop: int):
    return x[..., crop:-crop, crop:-crop, :]
