"""Pallas epilogue fusion for the ConvGRU cell (XLA convs kept).

The full-cell Pallas kernel (ttc/ops/pallas_gru.py) lost to XLA because
3x3 conv taps need unaligned vector loads that Mosaic lowers to
relayout copies. This module keeps the convolutions on XLA's fast MXU
path and fuses only what XLA cannot: the cross-op elementwise/stats
chains between the convs, which otherwise cost one HBM round trip of
the (B, 172, 172, C) activations per op (the measured +36 ms
activations / +34 ms GroupNorm / +23 ms reflect-pad bisect items,
TODO.md):

  K1 (gates epilogue):  y -> GN16(y) (== per-gate GN8 on each half) ->
                        sigmoid -> u out, reflect_pad(r*h) out (feeds
                        the candidate conv directly, killing the
                        separate pad pass)
  K2 (cand epilogue):   c -> sSE 1x1 gate -> GN8 -> tanh ->
                        h' = u*h + (1-u)*tanh -> zoneout blend ->
                        blended carry emitted ALREADY reflect-padded
                        for the next step's gates conv

GroupNorm statistics are fp32 (matching ttc.models.layers.GroupNorm);
activations stay bf16 in VMEM — Mosaic tiles the minor (W, C) dims to
(8, 128), so C=32 blocks pad 4x in lanes and every extra f32
temporary costs 15 MB of scoped VMEM; the bf16-resident formulation is
what makes the kernels fit.

Used by ZoneoutConvGRU(epilogue=True) (inference only; the flax path
remains the reference semantics and the training path). Numerics are
gated against the flax bf16 cell in tests/test_pallas_epilogue.py.

STATUS (v5e, 2026-08, round 4): numerically verified (max pred drift
0.034 uint8-steps-equivalent vs the flax bf16 path) but measured
1.7x SLOWER end to end: 165.7 ms/tile vs 96.4 ms/tile at tile_batch 4
(best-of-3, same hour, baseline recheck 96.4). Root cause: Mosaic
tiles the minor (W, C) dims to (8, 128), so every (172, 172, 32)
bf16 block pads its 32-channel lane dim 4x — in VMEM (two kernels
overflowed scoped VMEM before slimming) AND in the custom-call HBM
layout, where XLA inserts relayout copies at every pallas boundary.
The 4x wire tax at each kernel edge exceeds the HBM round trips the
fusion removes. Together with round 3's full-cell attempt (1.9x
slower, per-tap relayouts) this closes the "Pallas epilogue fusion"
lever: for C<=64 NHWC activations the XLA conv+fusion path is the
fast path on this hardware generation. Kept as an experimental flag
(TreeCoverNet(epilogue=True)); not used in production.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ttc.ops.pallas_gru import _group_matrix

_VMEM_LIMIT = 110 * 1024 * 1024


def _gn_apply_b(y, gamma, beta, groups: int, eps: float = 1e-5):
    """GroupNorm with fp32 statistics but a bf16 normalize pass —
    avoids materializing a full-precision copy of the block (15 MB of
    scoped VMEM per (172,172,32) f32 temporary)."""
    h, w, c = y.shape
    per = c // groups
    gm = _group_matrix(c, groups)                            # (C, G)
    s = jnp.sum(jnp.sum(y.astype(jnp.float32), axis=0), axis=0,
                keepdims=True)                               # (1, C)
    ss = jnp.sum(jnp.sum(y.astype(jnp.float32) ** 2, axis=0), axis=0,
                 keepdims=True)
    sg = jnp.dot(s, gm, preferred_element_type=jnp.float32)
    ssg = jnp.dot(ss, gm, preferred_element_type=jnp.float32)
    n = jnp.float32(h * w * per)
    mean = sg / n
    var = ssg / n - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    inv_c = jnp.dot(inv, gm.T, preferred_element_type=jnp.float32)
    mean_c = jnp.dot(mean, gm.T, preferred_element_type=jnp.float32)
    scale = (inv_c * gamma[None]).astype(y.dtype)            # (1, C)
    bias = (beta[None] - mean_c * inv_c * gamma[None]).astype(y.dtype)
    return y * scale[None] + bias[None]


def _write_padded(ref, interior):
    """Write `interior` (H, W, C) into a (1, H+2, W+2, C) ref with its
    1-px reflect-pad border, via ref-slice writes (value-level concats
    would materialize two more (H+2, W+2, C) temporaries in VMEM)."""
    h, w = interior.shape[0], interior.shape[1]
    ref[0, 1:1 + h, 1:1 + w] = interior
    ref[0, 0, 1:1 + w] = interior[1]
    ref[0, 1 + h, 1:1 + w] = interior[h - 2]
    ref[0, :, 0] = ref[0, :, 2]
    ref[0, :, 1 + w] = ref[0, :, w - 1]


def _sigmoid_b(x):
    """Sigmoid evaluated without f32 scalar broadcasts into bf16
    vectors (Mosaic verifier rejects those)."""
    one = jnp.full((), 1.0, x.dtype)
    return one / (one + jnp.exp(-x))


def _tanh_b(x):
    two = jnp.full((), 2.0, x.dtype)
    one = jnp.full((), 1.0, x.dtype)
    return two * _sigmoid_b(two * x) - one


def _gates_epi_body(y_ref, hp_ref, g_ref, b_ref, u_ref, rhp_ref, *, f):
    y = y_ref[0]                                   # (H, W, 2F) bf16
    h, w = y.shape[0], y.shape[1]
    # one GN over both gates: G=16 on 2F channels == per-gate G=8
    # (groups never cross the r/u boundary)
    ru = _sigmoid_b(_gn_apply_b(y, g_ref[:], b_ref[:], 16))
    u_ref[0] = ru[..., f:]
    hh = hp_ref[0, 1:1 + h, 1:1 + w, :]            # carry interior
    _write_padded(rhp_ref, ru[..., :f] * hh)


def _cand_sse_gn_body(c_ref, ws, gc_g, gc_b, t_ref, *, f):
    """K2a: sSE gate + GN + tanh (everything per-pixel + per-sample
    stats; split from the blend so each kernel fits scoped VMEM)."""
    c = c_ref[0]                                   # (H, W, F) bf16
    # sSE logit as a (H, W) 2-D map (a (H, W, 1) block would pad its
    # unit lane dim to 128 and waste 15 MB of VMEM)
    logit = jnp.sum(c.astype(jnp.float32) * ws[:].astype(jnp.float32),
                    axis=-1)                       # (H, W) f32
    gate = jax.nn.sigmoid(logit).astype(c.dtype)
    y = c * gate[..., None]
    y = _gn_apply_b(y, gc_g[:], gc_b[:], 8)
    t_ref[0] = _tanh_b(y)




@functools.partial(jax.jit, static_argnames=("f", "interpret"))
def gates_epilogue(y, carry_p, gn_gamma, gn_beta, f: int,
                   interpret: bool = False):
    """(B,H,W,2F) gates conv out + (B,H+2,W+2,F) padded carry ->
    (u, reflect_pad(r*carry)). gn_gamma/beta are the concatenated
    r|u GroupNorm params (2F,)."""
    b, h, w, _ = y.shape
    sample = lambda i: (i, 0, 0, 0)
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_gates_epi_body, f=f),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h, w, 2 * f), sample,
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, h + 2, w + 2, f), sample,
                               memory_space=pltpu.VMEM),
                  full((2 * f,)), full((2 * f,))],
        out_specs=(pl.BlockSpec((1, h, w, f), sample,
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, h + 2, w + 2, f), sample,
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((b, h, w, f), y.dtype),
                   jax.ShapeDtypeStruct((b, h + 2, w + 2, f), y.dtype)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(y, carry_p, gn_gamma.astype(jnp.float32),
      gn_beta.astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("f", "interpret"))
def cand_epilogue(c, sse_w, gn_c_gamma, gn_c_beta, f: int,
                  interpret: bool = False):
    """(B,H,W,F) candidate conv out -> tanh(GN(sSE(c))). The remaining
    GRU combine + zoneout blend + pad is pure elementwise that XLA
    fuses into ~2 passes on its own; a third Pallas kernel for it
    overflowed scoped VMEM (the lane-padded (172,172,32) blocks cost
    7.6-7.8 MB each with double-buffered grid pipelining)."""
    b, h, w, _ = c.shape
    sample = lambda i: (i, 0, 0, 0)
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_cand_sse_gn_body, f=f),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h, w, f), sample,
                               memory_space=pltpu.VMEM),
                  full((f,)), full((f,)), full((f,))],
        out_specs=pl.BlockSpec((1, h, w, f), sample,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, f), c.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(c, sse_w.astype(c.dtype), gn_c_gamma.astype(jnp.float32),
      gn_c_beta.astype(jnp.float32))


def epilogue_zoneout_gru(x_seq, cell_params, zoneout: float = 0.75,
                         dtype=jnp.bfloat16, interpret: bool = False):
    """Inference ZoneoutConvGRU forward: XLA convs + Pallas epilogues.

    x_seq: (B, T, H, W, Cx). cell_params: a ConvGRUCell param subtree
    (gates_kernel, candidate_kernel, candidate_sse_kernel,
    norm_gates_r/u, norm_candidate). Returns (steps (B,T,H,W,F),
    final carry (B,H,W,F)) matching ZoneoutConvGRU's deterministic
    path in bf16.
    """
    from ttc.models.layers import reflect_pad_2d

    p = cell_params
    gates_k = p["gates_kernel"].astype(dtype)
    cand_k = p["candidate_kernel"].astype(dtype)
    sse_w = p["candidate_sse_kernel"][0, 0, :, 0]        # (F,)
    gn_g = jnp.concatenate([p["norm_gates_r"]["gamma"],
                            p["norm_gates_u"]["gamma"]])
    gn_b = jnp.concatenate([p["norm_gates_r"]["beta"],
                            p["norm_gates_u"]["beta"]])
    f = cand_k.shape[-1]
    b, t, h, w, _ = x_seq.shape

    def conv(inp, kernel):
        return jax.lax.conv_general_dilated(
            inp, kernel, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    carry_p = jnp.zeros((b, h + 2, w + 2, f), dtype)
    steps = []
    for step in range(t):
        xp = reflect_pad_2d(x_seq[:, step]).astype(dtype)
        y = conv(jnp.concatenate([xp, carry_p], axis=-1), gates_k)
        u, rhp = gates_epilogue(y, carry_p, gn_g, gn_b, f=f,
                                interpret=interpret)
        c = conv(jnp.concatenate([xp, rhp], axis=-1), cand_k)
        t_act = cand_epilogue(
            c, sse_w, p["norm_candidate"]["gamma"],
            p["norm_candidate"]["beta"], f=f, interpret=interpret)
        carry = carry_p[:, 1:1 + h, 1:1 + w, :]
        one = jnp.asarray(1.0, dtype)
        h_new = u * carry + (one - u) * t_act
        blended = carry * jnp.asarray(zoneout, dtype) \
            + h_new * jnp.asarray(1.0 - zoneout, dtype)
        carry_p = reflect_pad_2d(blended)
        steps.append(h_new)
    final = carry_p[:, 1:1 + h, 1:1 + w, :]
    return jnp.stack(steps, axis=1), final
