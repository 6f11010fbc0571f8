"""Fused ConvGRU cell as Pallas TPU kernels.

The ConvGRU step (reference semantics in ttc/models/convgru.py) is the
hot path of tile inference: per step it runs two 3x3 convolutions with
a GroupNorm/sigmoid/tanh chain between them. XLA cannot fuse across the
conv -> global-stats -> conv boundary, so each step makes ~10 HBM round
trips over (B, 172, 172, 64) activations.

Here the step is two pallas_call kernels, gridded over the batch, with
one sample's activations resident in VMEM:

  K1 gates:     y = conv3x3(xh_pad, Wg)   (9 shifted MXU contractions)
                r = sigmoid(GN_8(y[..., :F])), u = sigmoid(GN_8(y[..., F:]))
  K2 candidate: rh = reflect_pad(r * h); c = conv3x3([x, rh], Wc)
                c = c * sigmoid(conv1x1(c, Ws)); c = tanh(GN_8(c))
                h' = u * h + (1 - u) * c

Activations are bf16 with fp32 accumulation and fp32 GroupNorm
statistics. HBM traffic per step drops from ~10 passes to 3 (read
xh_pad, write r/u, write h'). Kernels run in interpret mode on CPU for
tests.

STATUS (v5e, 2026-08): numerically verified (maxdiff ~0.02 vs the fp32
flax cell) but 1.9x SLOWER than the XLA path (33 ms vs 17.8 ms per
(36, 172, 172) step) — Mosaic requires 8-aligned dynamic sublane
offsets, so the unaligned conv taps compile to per-tap relayout copies
that dominate runtime. Kept as an optional experimental path
(`TreeCoverNet` does not use it); revisit with an im2col-in-VMEM
single-matmul formulation or when Mosaic gains unaligned vector loads.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class FusedGRUParams(NamedTuple):
    gates_kernel: jax.Array       # (3, 3, Cx + F, 2F)
    cand_kernel: jax.Array        # (3, 3, Cx + F, F)
    sse_kernel: jax.Array         # (F, 1)
    gn_r_gamma: jax.Array         # (F,)
    gn_r_beta: jax.Array
    gn_u_gamma: jax.Array
    gn_u_beta: jax.Array
    gn_c_gamma: jax.Array
    gn_c_beta: jax.Array


def _group_matrix(c: int, groups: int):
    """(C, G) one-hot channel->group matrix, built with iota inside the
    kernel (pallas kernels cannot capture array constants, and Mosaic
    cannot lay out 1-D reshapes)."""
    per = c // groups
    rows = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    return (rows // per == cols).astype(jnp.float32)


def _gn_scale_bias(y, gamma, beta, groups: int, eps: float = 1e-5):
    """GroupNorm over an (H, W, C) fp32 block: returns normalized out.

    All reductions stay >=2-D (Mosaic has no 1-D vector-matrix ops):
    channel sums as (1, C), group combine via (1, C) @ (C, G).
    """
    h, w, c = y.shape
    per = c // groups
    gm = _group_matrix(c, groups)                   # (C, G)
    s = jnp.sum(jnp.sum(y, axis=0, dtype=jnp.float32), axis=0,
                keepdims=True)                                # (1, C)
    ss = jnp.sum(jnp.sum(y.astype(jnp.float32) ** 2, axis=0),
                 axis=0, keepdims=True)
    sg = jnp.dot(s, gm, preferred_element_type=jnp.float32)   # (1, G)
    ssg = jnp.dot(ss, gm, preferred_element_type=jnp.float32)
    n = jnp.float32(h * w * per)
    mean = sg / n
    var = ssg / n - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    inv_c = jnp.dot(inv, gm.T,
                    preferred_element_type=jnp.float32)       # (1, C)
    mean_c = jnp.dot(mean, gm.T,
                     preferred_element_type=jnp.float32)
    scale = inv_c * gamma[None]                                # (1, C)
    bias = beta[None] - mean_c * scale
    return (y.astype(jnp.float32) * scale[None]
            + bias[None]).astype(y.dtype)


def _conv3x3_ref(src_ref, kernel_ref, h: int, w: int, lead=None):
    """Shifted-tap 3x3 conv reading from VMEM refs: src_ref is
    (H+2, W+2, Cin) (optionally behind a leading unit index), kernel_ref
    is (9, Cin, Cout) tap-major. The tap loop is a fori_loop with pl.ds
    ref slices — Mosaic supports dynamic ref slicing but neither
    dynamic_slice on values nor 9 fully unrolled 172^2 windows (which
    OOM the compile helper)."""
    cout = kernel_ref.shape[-1]

    # W (sublane) offsets must be static for Mosaic vector loads, so
    # the 3 dx taps are unrolled; the H offsets stay dynamic inside a
    # fori_loop to keep the IR small enough for the compile helper.
    # The running sum is bf16 (each tap's dot still accumulates fp32
    # internally) — halves VMEM pressure; GroupNorm statistics are
    # re-accumulated in fp32 downstream.
    acc = jnp.zeros((h, w, cout), jnp.bfloat16)
    for dx in range(3):
        def tap(dy, a, dx=dx):
            if lead is None:
                block = src_ref[pl.ds(dy, h), dx:dx + w, :]
            else:
                block = src_ref[lead, pl.ds(dy, h), dx:dx + w, :]
            kmat = kernel_ref[pl.ds(3 * dy + dx, 1)][0]
            return a + jax.lax.dot_general(
                block, kmat,
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)

        acc = jax.lax.fori_loop(0, 3, tap, acc)
    return acc


def _gates_kernel_body(xh_ref, wg_ref, gr_g_ref, gr_b_ref, gu_g_ref,
                       gu_b_ref, ru_ref, *, h, w, f):
    y = _conv3x3_ref(xh_ref, wg_ref, h, w, lead=0)
    r = _gn_scale_bias(y[..., :f], gr_g_ref[:], gr_b_ref[:], 8)
    u = _gn_scale_bias(y[..., f:], gu_g_ref[:], gu_b_ref[:], 8)
    ru_ref[0, :, :, :f] = jax.nn.sigmoid(
        r.astype(jnp.float32)).astype(ru_ref.dtype)
    ru_ref[0, :, :, f:] = jax.nn.sigmoid(
        u.astype(jnp.float32)).astype(ru_ref.dtype)


def _reflect_pad_hw(x):
    """(H, W, C) -> (H+2, W+2, C) reflect pad inside the kernel."""
    top = x[1:2]
    bot = x[-2:-1]
    x = jnp.concatenate([top, x, bot], axis=0)
    left = x[:, 1:2]
    right = x[:, -2:-1]
    return jnp.concatenate([left, x, right], axis=1)


def _cand_kernel_body(xh_ref, ru_ref, wc_ref, ws_ref, gc_g_ref,
                      gc_b_ref, out_ref, scratch_ref, *, h, w, f, cx):
    # Assemble the candidate conv input [x, reflect_pad(r*h)] directly
    # in VMEM scratch with ref writes — no value-level concats (each
    # would materialize another (H+2, W+2, C) temporary).
    scratch_ref[:, :, :cx] = xh_ref[0, :, :, :cx]
    r = ru_ref[0, :, :, :f].astype(jnp.float32)
    hh = xh_ref[0, 1:1 + h, 1:1 + w, cx:].astype(jnp.float32)
    scratch_ref[1:1 + h, 1:1 + w, cx:] = (r * hh).astype(
        scratch_ref.dtype)
    # reflect pad of the rh block: row/col 0 mirrors row/col 2, the
    # far edge mirrors two in from the end (numpy 'reflect')
    scratch_ref[0, 1:1 + w, cx:] = scratch_ref[2, 1:1 + w, cx:]
    scratch_ref[h + 1, 1:1 + w, cx:] = scratch_ref[h - 1, 1:1 + w, cx:]
    scratch_ref[:, 0, cx:] = scratch_ref[:, 2, cx:]
    scratch_ref[:, w + 1, cx:] = scratch_ref[:, w - 1, cx:]

    y = _conv3x3_ref(scratch_ref, wc_ref, h, w)     # (H, W, F) bf16
    gate = jax.nn.sigmoid(jax.lax.dot_general(
        y, ws_ref[:],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32))
    y = (y.astype(jnp.float32) * gate).astype(jnp.bfloat16)
    y = _gn_scale_bias(y, gc_g_ref[:], gc_b_ref[:], 8)
    c = jnp.tanh(y.astype(jnp.float32))
    u = ru_ref[0, :, :, f:].astype(jnp.float32)
    hh2 = xh_ref[0, 1:1 + h, 1:1 + w, cx:].astype(jnp.float32)
    h_new = u * hh2 + (1.0 - u) * c
    out_ref[0] = h_new.astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("interpret",))
def fused_convgru_step(xh_pad, params: FusedGRUParams,
                       interpret: bool = False):
    """One ConvGRU cell evaluation.

    xh_pad: (B, H+2, W+2, Cx+F) bf16, reflect-padded concat of the step
    input and the carry state. Returns h_new (B, H, W, F) bf16.
    """
    b, hp, wp, cin = xh_pad.shape
    h, w = hp - 2, wp - 2
    f = params.cand_kernel.shape[-1]
    cx = cin - f
    dtype = xh_pad.dtype

    sample = lambda i: (i, 0, 0, 0)
    spec_xh = pl.BlockSpec((1, hp, wp, cin), sample,
                           memory_space=pltpu.VMEM)
    spec_hw_f = pl.BlockSpec((1, h, w, f), sample,
                             memory_space=pltpu.VMEM)
    spec_hw_2f = pl.BlockSpec((1, h, w, 2 * f), sample,
                              memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)

    ru = pl.pallas_call(
        functools.partial(_gates_kernel_body, h=h, w=w, f=f),
        grid=(b,),
        in_specs=[spec_xh, full((9, cin, 2 * f)), full((f,)),
                  full((f,)), full((f,)), full((f,))],
        out_specs=spec_hw_2f,
        out_shape=jax.ShapeDtypeStruct((b, h, w, 2 * f), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(xh_pad, params.gates_kernel.reshape(9, cin, 2 * f).astype(dtype),
      params.gn_r_gamma.astype(jnp.float32),
      params.gn_r_beta.astype(jnp.float32),
      params.gn_u_gamma.astype(jnp.float32),
      params.gn_u_beta.astype(jnp.float32))

    h_new = pl.pallas_call(
        functools.partial(_cand_kernel_body, h=h, w=w, f=f, cx=cx),
        grid=(b,),
        in_specs=[spec_xh, spec_hw_2f,
                  full((9, cin, f)), full((f, 1)), full((f,)),
                  full((f,))],
        out_specs=spec_hw_f,
        out_shape=jax.ShapeDtypeStruct((b, h, w, f), dtype),
        scratch_shapes=[pltpu.VMEM((hp, wp, cin), dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(xh_pad, ru, params.cand_kernel.reshape(9, cin, f).astype(dtype),
      params.sse_kernel.astype(dtype),
      params.gn_c_gamma.astype(jnp.float32),
      params.gn_c_beta.astype(jnp.float32))
    return h_new


def params_from_cell(cell_params) -> FusedGRUParams:
    """Adapt a ttc.models.convgru.ConvGRUCell param subtree."""
    p = cell_params
    return FusedGRUParams(
        gates_kernel=p["gates_kernel"],
        cand_kernel=p["candidate_kernel"],
        sse_kernel=p["candidate_sse_kernel"][0, 0],
        gn_r_gamma=p["norm_gates_r"]["gamma"],
        gn_r_beta=p["norm_gates_r"]["beta"],
        gn_u_gamma=p["norm_gates_u"]["gamma"],
        gn_u_beta=p["norm_gates_u"]["beta"],
        gn_c_gamma=p["norm_candidate"]["gamma"],
        gn_c_beta=p["norm_candidate"]["beta"],
    )


def fused_zoneout_gru(x_seq, h0, params: FusedGRUParams,
                      zoneout: float = 0.75, interpret: bool = False):
    """Inference-mode zoneout GRU over (B, T, H, W, Cx) using the fused
    cell. Returns (per-step outputs, final blended state), fp32."""
    b, t, h, w, cx = x_seq.shape
    f = h0.shape[-1]
    carry = h0
    outs = []
    for step in range(t):
        xh = jnp.concatenate(
            [x_seq[:, step], carry], axis=-1).astype(jnp.bfloat16)
        xh_pad = jnp.pad(xh, ((0, 0), (1, 1), (1, 1), (0, 0)),
                         mode="reflect")
        h_new = fused_convgru_step(xh_pad, params,
                                   interpret=interpret)
        h_new = h_new.astype(jnp.float32)
        outs.append(h_new)
        carry = carry * zoneout + h_new * (1.0 - zoneout)
    return jnp.stack(outs, axis=1), carry


# ------------------------------------------------------------------
# im2col variant: materialize the 9 shifted taps as one (H*W, 9*Cin)
# VMEM buffer and run ONE MXU matmul per conv instead of 9 tap dots —
# trades VMEM capacity (~30 MB scratch) for fewer relayouts.

def _im2col(xh, scratch_ref, h, w, cin):
    """xh: (H+2, W+2, Cin) value; fills scratch (H*W, 9*Cin)."""
    for k in range(9):
        dy, dx = k // 3, k % 3
        tap = xh[dy:dy + h, dx:dx + w, :].reshape(h * w, cin)
        scratch_ref[:, k * cin:(k + 1) * cin] = tap


def _gates_im2col_body(xh_ref, wg_ref, gr_g_ref, gr_b_ref, gu_g_ref,
                       gu_b_ref, ru_ref, col_ref, *, h, w, f, cin):
    _im2col(xh_ref[0], col_ref, h, w, cin)
    y = jax.lax.dot_general(
        col_ref[:], wg_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (H*W, 2F) fp32
    y = y.reshape(h, w, 2 * f).astype(jnp.bfloat16)
    r = _gn_scale_bias(y[..., :f], gr_g_ref[:], gr_b_ref[:], 8)
    u = _gn_scale_bias(y[..., f:], gu_g_ref[:], gu_b_ref[:], 8)
    ru_ref[0, :, :, :f] = jax.nn.sigmoid(
        r.astype(jnp.float32)).astype(ru_ref.dtype)
    ru_ref[0, :, :, f:] = jax.nn.sigmoid(
        u.astype(jnp.float32)).astype(ru_ref.dtype)


def _cand_im2col_body(xh_ref, ru_ref, wc_ref, ws_ref, gc_g_ref,
                      gc_b_ref, out_ref, pad_ref, col_ref, *, h, w, f,
                      cx):
    cin = cx + f
    pad_ref[:, :, :cx] = xh_ref[0, :, :, :cx]
    r = ru_ref[0, :, :, :f].astype(jnp.float32)
    hh = xh_ref[0, 1:1 + h, 1:1 + w, cx:].astype(jnp.float32)
    pad_ref[1:1 + h, 1:1 + w, cx:] = (r * hh).astype(pad_ref.dtype)
    pad_ref[0, 1:1 + w, cx:] = pad_ref[2, 1:1 + w, cx:]
    pad_ref[h + 1, 1:1 + w, cx:] = pad_ref[h - 1, 1:1 + w, cx:]
    pad_ref[:, 0, cx:] = pad_ref[:, 2, cx:]
    pad_ref[:, w + 1, cx:] = pad_ref[:, w - 1, cx:]

    _im2col(pad_ref[:], col_ref, h, w, cin)
    y = jax.lax.dot_general(
        col_ref[:], wc_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = y.reshape(h, w, f).astype(jnp.bfloat16)
    gate = jax.nn.sigmoid(jax.lax.dot_general(
        y, ws_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32))
    y = (y.astype(jnp.float32) * gate).astype(jnp.bfloat16)
    y = _gn_scale_bias(y, gc_g_ref[:], gc_b_ref[:], 8)
    c = jnp.tanh(y.astype(jnp.float32))
    u = ru_ref[0, :, :, f:].astype(jnp.float32)
    h_new = u * hh + (1.0 - u) * c
    out_ref[0] = h_new.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_convgru_step_im2col(xh_pad, params: FusedGRUParams,
                              interpret: bool = False):
    b, hp, wp, cin = xh_pad.shape
    h, w = hp - 2, wp - 2
    f = params.cand_kernel.shape[-1]
    cx = cin - f
    dtype = xh_pad.dtype

    sample = lambda i: (i, 0, 0, 0)
    spec_xh = pl.BlockSpec((1, hp, wp, cin), sample,
                           memory_space=pltpu.VMEM)
    spec_hw_f = pl.BlockSpec((1, h, w, f), sample,
                             memory_space=pltpu.VMEM)
    spec_hw_2f = pl.BlockSpec((1, h, w, 2 * f), sample,
                              memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    cp = pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024)

    wg = params.gates_kernel.reshape(9 * cin, 2 * f).astype(dtype)
    wc = params.cand_kernel.reshape(9 * cin, f).astype(dtype)

    ru = pl.pallas_call(
        functools.partial(_gates_im2col_body, h=h, w=w, f=f, cin=cin),
        grid=(b,),
        in_specs=[spec_xh, full((9 * cin, 2 * f)), full((f,)),
                  full((f,)), full((f,)), full((f,))],
        out_specs=spec_hw_2f,
        out_shape=jax.ShapeDtypeStruct((b, h, w, 2 * f), dtype),
        scratch_shapes=[pltpu.VMEM((h * w, 9 * cin), dtype)],
        compiler_params=cp,
        interpret=interpret,
    )(xh_pad, wg, params.gn_r_gamma.astype(jnp.float32),
      params.gn_r_beta.astype(jnp.float32),
      params.gn_u_gamma.astype(jnp.float32),
      params.gn_u_beta.astype(jnp.float32))

    h_new = pl.pallas_call(
        functools.partial(_cand_im2col_body, h=h, w=w, f=f, cx=cx),
        grid=(b,),
        in_specs=[spec_xh, spec_hw_2f, full((9 * cin, f)),
                  full((f, 1)), full((f,)), full((f,))],
        out_specs=spec_hw_f,
        out_shape=jax.ShapeDtypeStruct((b, h, w, f), dtype),
        scratch_shapes=[pltpu.VMEM((hp, wp, cin), dtype),
                        pltpu.VMEM((h * w, 9 * cin), dtype)],
        compiler_params=cp,
        interpret=interpret,
    )(xh_pad, ru, wc, params.sse_kernel.astype(dtype),
      params.gn_c_gamma.astype(jnp.float32),
      params.gn_c_beta.astype(jnp.float32))
    return h_new
