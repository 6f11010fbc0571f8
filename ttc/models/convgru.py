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

        # NB: conv(concat(x, h)) measured faster than the algebraically
        # equal conv(x, Wx) + conv(h, Wh) split on v5e (odd-channel
        # kernel slices fall off the fast conv path).
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

    `epilogue` (inference + bf16 only) routes each step through XLA
    convs + the Pallas epilogue kernels of ttc.ops.pallas_epilogue,
    fusing the GN/sigmoid/sSE/tanh/zoneout/reflect-pad chains into two
    VMEM-resident passes (drift-gated, tests/test_pallas_epilogue.py).
    """

    filters: int
    zoneout: float = 0.75
    dtype: Optional[jnp.dtype] = None
    epilogue: bool = False

    @nn.compact
    def __call__(self, x_seq, deterministic: bool = True):
        b, t, h, w, _ = x_seq.shape
        cell = ConvGRUCell(self.filters, dtype=self.dtype, name="cell")
        if (self.epilogue and deterministic
                and self.dtype == jnp.bfloat16
                and not self.is_initializing()):
            from ttc.ops.pallas_epilogue import epilogue_zoneout_gru

            # bind the cell's params with a tiny dummy call (XLA DCEs
            # the unused compute); the kernels consume the raw values
            _ = cell(jnp.zeros((1, 8, 8, x_seq.shape[-1]),
                               x_seq.dtype),
                     jnp.zeros((1, 8, 8, self.filters), x_seq.dtype))
            return epilogue_zoneout_gru(
                x_seq, cell.variables["params"], self.zoneout,
                dtype=jnp.bfloat16,
                interpret=jax.default_backend() == "cpu")
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
    final_concat = concat(fw_final, bw_final) over channels.

    TPU note: when `shared_stream` (default), the forward and
    time-reversed sequences are stacked along the batch axis and run
    through ONE cell stream per direction-pair — halving the number of
    convolution dispatches with identical math (separate fw/bw
    parameters are carried as grouped kernels).
    """

    filters: int
    zoneout: float = 0.75
    dtype: Optional[jnp.dtype] = None
    # grouped-conv single-dispatch variant; measured slower than two
    # plain convs on v5e (grouped conv misses the fast MXU path), so
    # off by default
    shared_stream: bool = False
    epilogue: bool = False

    @nn.compact
    def __call__(self, x_seq, deterministic: bool = True):
        if not self.shared_stream:
            fw_out, fw_final = ZoneoutConvGRU(
                self.filters, self.zoneout, self.dtype, name="fw",
                epilogue=self.epilogue)(
                    x_seq, deterministic)
            bw_out, bw_final = ZoneoutConvGRU(
                self.filters, self.zoneout, self.dtype, name="bw",
                epilogue=self.epilogue)(
                    jnp.flip(x_seq, axis=1), deterministic)
            bw_out = jnp.flip(bw_out, axis=1)
            final = jnp.concatenate([fw_final, bw_final], axis=-1)
            steps = jnp.concatenate([fw_out, bw_out], axis=-1)
            return final, steps

        fw_out, bw_out, final = DirectionalZoneoutConvGRU(
            self.filters, self.zoneout, self.dtype, name="cells")(
                x_seq, deterministic)
        steps = jnp.concatenate([fw_out, bw_out], axis=-1)
        return final, steps


class DirectionalConvGRUCell(nn.Module):
    """ConvGRU cell evaluating BOTH directions in single dispatches.

    Channel layout: direction-major — inputs (B, H, W, 2*C) with fw
    channels first. Each convolution uses feature_group_count=2 with
    the fw/bw kernels concatenated on the output axis, so one XLA conv
    evaluates both independent parameter sets. A single
    GroupNorm(groups=16) over 2*C channels is exactly per-direction
    GN(G=8) because groups never cross the direction boundary.
    """

    filters: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x2, h2):
        # x2: (B, H, W, 2*Cx); h2: (B, H, W, 2*f), direction-major
        f = self.filters
        cx = x2.shape[-1] // 2
        cin = cx + f

        def gkernel(name, cout):
            fw = self.param(f"fw_{name}",
                            nn.initializers.glorot_uniform(),
                            (3, 3, cin, cout), jnp.float32)
            bw = self.param(f"bw_{name}",
                            nn.initializers.glorot_uniform(),
                            (3, 3, cin, cout), jnp.float32)
            return jnp.concatenate([fw, bw], axis=-1)

        gates_k = gkernel("gates_kernel", 2 * f)
        cand_k = gkernel("candidate_kernel", f)
        sse_fw = self.param("fw_candidate_sse_kernel",
                            nn.initializers.glorot_uniform(),
                            (1, 1, f, 1), jnp.float32)
        sse_bw = self.param("bw_candidate_sse_kernel",
                            nn.initializers.glorot_uniform(),
                            (1, 1, f, 1), jnp.float32)
        sse_k = jnp.concatenate([sse_fw, sse_bw], axis=-1)

        def gconv(inp, kernel, pad=True, groups=2):
            if pad:
                inp = reflect_pad_2d(inp)
            if self.dtype is not None:
                inp = inp.astype(self.dtype)
                kernel = kernel.astype(self.dtype)
            return jax.lax.conv_general_dilated(
                inp, kernel, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=groups)

        inputs = jnp.concatenate(
            [x2[..., :cx], h2[..., :f], x2[..., cx:], h2[..., f:]],
            axis=-1)                                     # (B,H,W,2*cin)
        y = gconv(inputs, gates_k)                       # (B,H,W,4f)
        # per-direction split into r, u
        r = jnp.concatenate([y[..., :f], y[..., 2 * f:3 * f]], axis=-1)
        u = jnp.concatenate([y[..., f:2 * f], y[..., 3 * f:]], axis=-1)
        r = GroupNorm(groups=16, name="norm_gates_r")(r)
        u = GroupNorm(groups=16, name="norm_gates_u")(u)
        r = jax.nn.sigmoid(r)
        u = jax.nn.sigmoid(u)

        rh = r * h2
        cand_in = jnp.concatenate(
            [x2[..., :cx], rh[..., :f], x2[..., cx:], rh[..., f:]],
            axis=-1)
        y = gconv(cand_in, cand_k)                       # (B,H,W,2f)
        gate = jax.nn.sigmoid(gconv(y, sse_k, pad=False))  # (B,H,W,2)
        y = y * jnp.concatenate(
            [jnp.repeat(gate[..., :1], f, axis=-1),
             jnp.repeat(gate[..., 1:], f, axis=-1)], axis=-1)
        y = GroupNorm(groups=16, name="norm_candidate")(y)

        return u * h2 + (1.0 - u) * jnp.tanh(y)


class DirectionalZoneoutConvGRU(nn.Module):
    """Zoneout scan over the direction-stacked cell. Input is the
    (B, T, H, W, C) sequence; the bw direction sees it time-reversed.
    Returns per-step outputs (B, T, H, W, 2f) [fw steps, bw steps
    re-reversed] and the final carry (B, H, W, 2f)."""

    filters: int
    zoneout: float = 0.75
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x_seq, deterministic: bool = True):
        b, t, h, w, c = x_seq.shape
        cell = DirectionalConvGRUCell(self.filters, dtype=self.dtype,
                                      name="cell")
        carry = jnp.zeros((b, h, w, 2 * self.filters), x_seq.dtype)
        p = self.zoneout

        outputs = []
        for step in range(t):
            x2 = jnp.concatenate(
                [x_seq[:, step], x_seq[:, t - 1 - step]], axis=-1)
            h_new = cell(x2, carry)
            outputs.append(h_new)
            if deterministic:
                carry = carry * p + h_new * (1.0 - p)
            else:
                key = self.make_rng("zoneout")
                keep_prev = jax.random.bernoulli(
                    key, p, carry.shape).astype(carry.dtype)
                carry = carry + (1.0 - keep_prev) * (h_new - carry)
        f = self.filters
        fw_steps = jnp.stack([o[..., :f] for o in outputs], axis=1)
        bw_steps = jnp.stack([outputs[t - 1 - i][..., f:]
                              for i in range(t)], axis=1)
        return fw_steps, bw_steps, carry
