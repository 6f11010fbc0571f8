"""Bidirectional convolutional GRU with zoneout.

Reference semantics (reference: src/train/src/model.py:152-292,540-579):

- Cell: gates from concat(x, h) -> reflect-pad -> 3x3 VALID conv ->
  split r,u -> per-gate GroupNorm(G=8) -> sigmoid; candidate from
  concat(x, r*h) -> conv -> sSE (1x1, no bias) -> GroupNorm -> tanh;
  h' = u*h + (1-u)*tanh(y).
- ZoneoutWrapper: per step the *carried state* is blended
  (train: element-wise Bernoulli keep of the previous state with
  probability p; inference: state = p*prev + (1-p)*new), while the raw
  cell output h' is emitted as the step output.
- gru_block returns the concatenated forward/backward **final states**
  (an EMA of cell outputs under inference zoneout) plus the per-step
  outputs.

TPU-first: the sequence length is a static 4 (quarterly steps), so the
time loop is unrolled — each step is two large 3x3 convolutions over
(B, H, W, C) that XLA schedules back-to-back on the MXU with fused
norm/gate elementwise epilogues.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ttc.models.layers import GroupNorm, reflect_pad_2d


class ConvGRUCell(nn.Module):
    filters: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, h):
        f = self.filters
        cin = x.shape[-1] + f

        gates_kernel = self.param(
            "gates_kernel", nn.initializers.glorot_uniform(),
            (3, 3, cin, 2 * f), jnp.float32)
        cand_kernel = self.param(
            "candidate_kernel", nn.initializers.glorot_uniform(),
            (3, 3, cin, f), jnp.float32)
        sse_kernel = self.param(
            "candidate_sse_kernel", nn.initializers.glorot_uniform(),
            (1, 1, f, 1), jnp.float32)

        def conv(inp, kernel):
            if self.dtype is not None:
                inp = inp.astype(self.dtype)
                kernel = kernel.astype(self.dtype)
            return jax.lax.conv_general_dilated(
                inp, kernel, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        inputs = reflect_pad_2d(jnp.concatenate([x, h], axis=-1))
        y = conv(inputs, gates_kernel)
        r, u = jnp.split(y, 2, axis=-1)
        r = GroupNorm(groups=8, name="norm_gates_r")(r)
        u = GroupNorm(groups=8, name="norm_gates_u")(u)
        r = jax.nn.sigmoid(r)
        u = jax.nn.sigmoid(u)

        cand_in = reflect_pad_2d(jnp.concatenate([x, r * h], axis=-1))
        y = conv(cand_in, cand_kernel)
        gate = jax.nn.sigmoid(conv(y, sse_kernel))
        y = y * gate
        y = GroupNorm(groups=8, name="norm_candidate")(y)

        return u * h + (1.0 - u) * jnp.tanh(y)


class ZoneoutConvGRU(nn.Module):
    """Unidirectional zoneout-wrapped ConvGRU (unrolled over T).

    Returns (outputs, final_state): outputs are the raw per-step cell
    outputs (B, T, H, W, F); final_state the zoneout-blended carry.
    """

    filters: int
    zoneout: float = 0.75
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x_seq, deterministic: bool = True):
        b, t, h, w, _ = x_seq.shape
        cell = ConvGRUCell(self.filters, dtype=self.dtype, name="cell")
        carry = jnp.zeros((b, h, w, self.filters), x_seq.dtype)
        p = self.zoneout

        outputs = []
        for step in range(t):
            h_new = cell(x_seq[:, step], carry)
            outputs.append(h_new)
            if deterministic:
                carry = carry * p + h_new * (1.0 - p)
            else:
                key = self.make_rng("zoneout")
                keep_prev = jax.random.bernoulli(
                    key, p, carry.shape).astype(carry.dtype)
                carry = carry + (1.0 - keep_prev) * (h_new - carry)
        return jnp.stack(outputs, axis=1), carry


class BiConvGRU(nn.Module):
    """Bidirectional ConvGRU block (reference gru_block,
    model.py:152-197): returns (final_concat, steps_concat) where
    final_concat = concat(fw_final, bw_final) over channels."""

    filters: int
    zoneout: float = 0.75
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x_seq, deterministic: bool = True):
        fw_out, fw_final = ZoneoutConvGRU(
            self.filters, self.zoneout, self.dtype, name="fw")(
                x_seq, deterministic)
        bw_out, bw_final = ZoneoutConvGRU(
            self.filters, self.zoneout, self.dtype, name="bw")(
                jnp.flip(x_seq, axis=1), deterministic)
        bw_out = jnp.flip(bw_out, axis=1)
        final = jnp.concatenate([fw_final, bw_final], axis=-1)
        steps = jnp.concatenate([fw_out, bw_out], axis=-1)
        return final, steps
