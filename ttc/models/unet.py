"""The temporal ConvGRU U-Net tree cover model.

Wiring replicates the reference training graph exactly
(reference: src/train/train-model.py:110-231):

  input (B, 5, S, S, 17); steps 0-3 = quarterly medians,
  step 4 = annual median composite.

  gru     = BiConvGRU(32) over steps 0-3            -> (B, S, S, 64)
  median  = ConvSwishGN(64, SAME) on step 4          -> (B, S, S, 64)
  concat  = ConvSwishGN(64, SAME) on [gru, median]   -> (B, S, S, 64)
  pool1   -> ConvSwishGN(128, VALID)                 -> S/2 - 2
  pool2   -> ConvSwishGN(256, VALID)                 -> S/4 - 3
  up2     = upsample x2 -> ConvSwishGN(128, SAME)
            concat crop2(conv1) -> ConvSwishGN(128, SAME)
  up3     = upsample x2 -> ConvSwishGN(64, SAME)
            concat crop6(concat) -> ConvSwishGN(64, VALID)
  out     = 1x1 sigmoid conv, bias init -log(0.68/0.32)

Output spatial size = input - 14 (28 -> 14 training, 172 -> 158
production). DropBlock keep-rate and zoneout noise are active only in
training mode.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ttc.models.convgru import BiConvGRU
from ttc.models.layers import ConvSwishGN, crop_2d, upsample_nearest_2d


class TreeCoverNet(nn.Module):
    base_filters: int = 64
    zoneout: float = 0.75
    dtype: Optional[jnp.dtype] = None
    # Pallas epilogue fusion in the GRU (inference + bf16 only)
    epilogue: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True,
                 keep_rate: float = 1.0, return_features: bool = False):
        bf = self.base_filters
        kw = dict(deterministic=deterministic, keep_rate=keep_rate)

        gru_final, gru_steps = BiConvGRU(
            bf // 2, self.zoneout, self.dtype, name="gru",
            epilogue=self.epilogue)(
                x[:, :-1], deterministic)
        # gru_drop: DropBlock2D on the GRU output (train only; identity
        # at inference, reference: train-model.py:147-151)
        gru = _maybe_dropblock(self, gru_final, deterministic, keep_rate)

        median = ConvSwishGN(bf, padding="SAME", dtype=self.dtype,
                             name="conv_median")(x[:, -1], **kw)

        concat = ConvSwishGN(bf, padding="SAME", dtype=self.dtype,
                             name="conv_concat")(
            jnp.concatenate([gru, median], axis=-1), **kw)

        pool1 = nn.max_pool(concat, (2, 2), strides=(2, 2))
        conv1 = ConvSwishGN(bf * 2, padding="VALID", dtype=self.dtype,
                            name="conv1")(pool1, **kw)

        pool2 = nn.max_pool(conv1, (2, 2), strides=(2, 2))
        conv2 = ConvSwishGN(bf * 4, padding="VALID", block_size=4,
                            dtype=self.dtype, name="conv2")(pool2, **kw)

        up2 = upsample_nearest_2d(conv2, 2)
        up2 = ConvSwishGN(bf * 2, padding="SAME", dtype=self.dtype,
                          name="up2")(up2, **kw)
        up2 = jnp.concatenate([up2, crop_2d(conv1, 2)], axis=-1)
        up2 = ConvSwishGN(bf * 2, padding="SAME", dtype=self.dtype,
                          name="up2_out")(up2, **kw)

        up3 = upsample_nearest_2d(up2, 2)
        up3 = ConvSwishGN(bf, padding="SAME", dtype=self.dtype,
                          name="up3")(up3, **kw)
        up3 = jnp.concatenate([up3, crop_2d(concat, 6)], axis=-1)
        up3 = ConvSwishGN(bf, padding="VALID", use_dropblock=False,
                          dtype=self.dtype, name="out")(up3, **kw)

        logits = nn.Conv(
            1, (1, 1), padding="VALID",
            bias_init=nn.initializers.constant(
                -jnp.log(0.68 / 0.32)),
            name="fm")(up3.astype(jnp.float32))
        preds = jax.nn.sigmoid(logits)[..., 0]

        if return_features:
            return preds, {"early": gru_steps, "late": up3}
        return preds


def inference_model(fp32: bool = False) -> TreeCoverNet:
    """The production inference network: bf16 activations (fp32
    GroupNorm and params), validated against fp32 on the trained
    release weights at mean |drift| 0.011 pp, p99 0.00 pp, 100%
    nodata agreement on a full 618 px fixture tile
    (tools/bench_bf16_drift.py; gate test tests/test_bf16_gate.py).
    Pass fp32=True to opt out."""
    return TreeCoverNet() if fp32 else TreeCoverNet(dtype=jnp.bfloat16)


def _maybe_dropblock(mod, x, deterministic, keep_rate):
    # keep_rate may be traced; at 1.0 the mask is all-ones (identity)
    if deterministic:
        return x
    from ttc.models.layers import apply_dropblock, dropblock_mask

    rng = mod.make_rng("dropblock")
    mask = dropblock_mask(rng, x.shape, keep_rate, block_size=5)
    return apply_dropblock(x, mask)
