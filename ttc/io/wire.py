"""Compact host->device wire format for raw tile payloads.

The reference ships every stack as full-range uint16
(reference: src/tof/tof_downloading.py:51-72 to_int16), which makes a
618 px 12-date tile a ~58 MB upload. On slow host links (the axon
tunnel measures 15-25 MB/s) that upload is the per-tile wall-time
floor, and even on PCIe it is wasted bandwidth: Sentinel-2 L2A
reflectance is temporally redundant (the same landscape under 12
illuminations) and nowhere near 16 bits of information.

This codec exploits that redundancy with a fixed-rate scheme the
device can decode inside the fused ARD program (no host round trips,
shape-static):

- S2 stacks (10 m and 20 m): one int8 REFERENCE plane (the per-pixel
  temporal median, offset by the band mean and scaled to its own
  range) plus per-date int8 RESIDUALS, square-root companded so the
  quantization step is finest exactly where the cloud/shadow masker's
  delta thresholds live (|r| ~ 0.01-0.1 -> step ~2e-3) and coarsest on
  cloud pixels that get masked and gap-filled anyway. Residual scales
  are per (date, band) maxima — nothing is clipped, large deltas stay
  large, so threshold crossings survive encoding.
- S1: the quarterly composites ride at their native 20 m resolution
  (half the 10 m grid) and are bilinearly upsampled on device — the
  reference acquires S1 at 20 m and upsamples host-side, so the
  full-resolution wire carried 4x redundant bytes.
- DEM slope: degrees in [0, 90] as fixed-scale uint16 (0.0014 deg
  quantization).

Per production tile: 58.1 MB -> ~28 MB. The end-to-end radiometric
drift is gated by tests/test_wire_gate.py the same way bf16 inference
is gated (tests/test_bf16_gate.py).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

SLOPE_MAX = 90.0


def encode_s2_compact(stack_u16: np.ndarray, native: bool = True):
    """(T, H, W, B) uint16 [0,1]x65535 reflectance -> (data, sc).

    data: (T+1, H, W, B) int8 — slot 0 is the reference plane, slots
          1..T the companded residuals.
    sc:   (T+2, B) float32 — row 0 band means, row 1 reference scales,
          rows 2..T+1 per-date residual scales.

    Dispatches to the fused native encoder (native/fastcodec.cpp)
    when built — ~5x faster than the numpy pass below at production
    geometry on a 1-core host. The two encoders round the even-T
    median midpoint differently, so residual scales (and with them
    some coarse-end levels) can differ — both are valid encodings:
    scales ride the wire, decoded fidelity is equal, and the drift
    gate (tests/test_wire_gate.py) bounds the decoded error for
    whichever encoder is loaded.
    """
    if native:
        from ttc.io.fastcodec import encode_s2_compact_native

        out = encode_s2_compact_native(stack_u16)
        if out is not None:
            return out
    x = stack_u16.astype(np.float32) / 65535.0
    med = np.median(x, axis=0)                         # (H, W, B)
    mean_b = med.mean(axis=(0, 1))                     # (B,)
    ref_scale = np.maximum(np.abs(med - mean_b).max(axis=(0, 1)),
                           1e-6)
    ref_q = np.round((med - mean_b) / ref_scale * 127.0)
    ref_q = ref_q.astype(np.int8)
    ref_dec = mean_b + ref_scale * ref_q.astype(np.float32) / 127.0

    r = x - ref_dec                                    # (T, H, W, B)
    rs = np.maximum(np.abs(r).max(axis=(1, 2)), 1e-6)  # (T, B)
    q = np.round(127.0 * np.sign(r)
                 * np.sqrt(np.abs(r) / rs[:, None, None, :]))
    data = np.concatenate([ref_q[None], q.astype(np.int8)], axis=0)
    sc = np.concatenate([mean_b[None], ref_scale[None], rs],
                        axis=0).astype(np.float32)
    return data, sc


def decode_s2_compact(data, sc):
    """Device-side decode (jittable): (T+1, H, W, B) int8 + (T+2, B)
    float32 -> (T, H, W, B) float32 reflectance in [0, 1]."""
    mean_b, ref_scale, rs = sc[0], sc[1], sc[2:]
    ref = mean_b + ref_scale * data[0].astype(jnp.float32) / 127.0
    q = data[1:].astype(jnp.float32) / 127.0
    r = rs[:, None, None, :] * q * jnp.abs(q)          # sqrt companding
    return jnp.clip(ref[None] + r, 0.0, 1.0)


def encode_slope_u16(slope: np.ndarray) -> np.ndarray:
    """Slope degrees [0, 90] float -> uint16 (fixed scale, no params)."""
    return np.round(np.clip(slope, 0.0, SLOPE_MAX) / SLOPE_MAX
                    * 65535.0).astype(np.uint16)


def decode_slope_u16(slope_u16) -> jnp.ndarray:
    return slope_u16.astype(jnp.float32) * (SLOPE_MAX / 65535.0)


def downsample_s1_u16(s1_u16: np.ndarray) -> np.ndarray:
    """(4, H, W, 2) uint16 linear quarterly composites -> (4, H/2,
    W/2, 2) by 2x2 mean in linear power space — the inverse of the
    host-side upsample the reference applies to its native 20 m S1
    acquisitions (SURVEY §2.1 download_sentinel_1_composite)."""
    t, h, w, c = s1_u16.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    x = s1_u16.astype(np.float32).reshape(t, h // 2, 2, w // 2, 2, c)
    return np.round(x.mean(axis=(2, 4))).astype(np.uint16)


def wire_nbytes(prep: dict) -> int:
    """Total host->device payload bytes of a host_prepare dict."""
    keys = ("s2_10", "s2_20", "s1", "dem", "s2_10_sc", "s2_20_sc")
    return sum(np.asarray(prep[k]).nbytes for k in keys if k in prep
               and prep[k] is not None)
