"""Analysis-ready-data assembly: raw tile -> smoothed model inputs.

Host-side orchestrator around jitted device stages, replicating
process_tile + smooth_large_tile
(reference: src/download_and_predict_job.py:641-995,1057-1096):

  raw uint16 stacks -> aligned float datacube -> cloud/shadow masking
  (with up-to-3 rounds of >90%-interpolated date removal) -> gap-fill ->
  24-step regrid -> Whittaker smooth -> 12 monthly steps + indices.

Device-resident by design: the raw uint16 stacks are uploaded once and
every intermediate stays a jax.Array on device; only tiny per-date
reductions (the date-removal decisions) are read back to the host for
control flow, and date removal itself is a device-side gather
(jnp.take). The reference streams the full ~200 MB datacube through
host numpy between every stage — on TPU that serializes the pipeline
on PCIe/host bandwidth, so this layout is worth ~100x on the ARD
stage when the host link is slow. The per-(T,H,W) jit cache makes
recompiles rare in production where tiles share geometry.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ttc.core.codecs import from_uint16, to_db
from ttc.io.acquisition import RawTile
from ttc.ops import indices as idx_ops
from ttc.ops.filters import median_filter
from ttc.ops.regrid import apply_regrid, regrid_weights
from ttc.ops.resize import resize_bilinear
from ttc.ops.temporal import (
    fill_extremes_with_median,
    id_missing_px,
)
from ttc.ops.sortnet import masked_median_axis0, median_axis0
from ttc.ops.whittaker import WhittakerSmoother
from ttc.ops.morphology import dilate
from ttc.preprocess.clouds import identify_clouds_shadows, snow_filter
from ttc.preprocess.gapfill import interp_weights, remove_cloud_and_shadows


@dataclasses.dataclass
class ProcessedTile:
    """Fields are jax.Arrays living on device (except `dates`);
    np.asarray() any field to materialize it on the host."""

    s2: object               # (T, H, W, 10) float32 clipped [0,1]
    dates: np.ndarray        # (T,) host
    interp: object           # (T, H, W) interpolation weights
    s1: object               # (12, H, W, 2) dB
    dem: object              # (H, W) / 90
    cloudshad: object        # (T, H, W)
    snow: object             # (H, W) snow-free mask


@dataclasses.dataclass
class SmoothedTile:
    """Device-resident smoothed model inputs (`dates` on host)."""

    s2: object               # (12, H, W, 14) smoothed bands + indices
    dates: np.ndarray
    interp: object
    s1: object
    dem: object
    s2_median: object        # (H, W, 14) raw medians (bands + indices)
    s1_median: object        # (H, W, 2)
    clear_count: object      # (H, W) count of clear acquisitions


def _adjust_shape(arr, width, height):
    """Center pad/crop the two spatial axes to (width, height)
    (reference: download_and_predict_job.py:260-310)."""
    arr = np.asarray(arr)
    lead = arr.ndim - 3 if arr.ndim >= 3 else 0
    if arr.ndim == 2:
        arr = arr[None, ..., None]
    elif arr.ndim == 3:
        arr = arr[..., None]

    for axis, target in ((1, width), (2, height)):
        cur = arr.shape[axis]
        if cur < target:
            lo = (target - cur) // 2
            hi = target - cur - lo
            cfg = [(0, 0)] * arr.ndim
            cfg[axis] = (lo, hi) if lo > 0 else (target - cur, 0)
            arr = np.pad(arr, cfg, mode="edge")
        elif cur > target:
            excess = cur - target
            lo = excess // 2
            hi = excess - lo
            sl = [slice(None)] * arr.ndim
            sl[axis] = slice(lo, cur - hi)
            arr = arr[tuple(sl)]
    return arr.squeeze()


def assemble_s2(s2_10, s2_20):
    """Build the (T, H, W, 10) device stack: native 10 m bands +
    bilinearly upsampled 20 m bands (SR refines bands 4:10 later)
    (reference: :735-783; odd-shape reconciliation handled by resize
    directly to the target grid)."""
    h, w = s2_10.shape[1], s2_10.shape[2]
    up = resize_bilinear(jnp.asarray(s2_20), (h, w))
    return jnp.concatenate([jnp.asarray(s2_10), up], axis=-1)


def _take_dates(to_rm, dates, *arrays):
    """Device-side date removal: gather the kept indices on device
    (the np.delete equivalent without a host round-trip)."""
    keep = np.setdiff1d(np.arange(len(dates)), to_rm)
    return (dates[keep],) + tuple(jnp.take(a, keep, axis=0)
                                  for a in arrays)


@jax.jit
def _ingest(s2_10, s2_20, s1, dem, s1_weights=None, wire_sc=None):
    """Decode + align + assemble the raw stacks in one device dispatch:
    wire decode, S1 dB conversion + quarterly->monthly expansion,
    DEM median filter, 20 m band upsample + concat (reference:
    :735-783, tof_downloading.py:75-95).

    Wire formats, dispatched statically on dtype/shape:
    - int8 S2 stacks + `wire_sc` scales: the compact companded-residual
      codec (ttc.io.wire, ~28 MB/tile) — the production default;
      host->device bandwidth is the pipeline's scarcest resource
    - uint16 S2 stacks: the reference's to_int16 format (58 MB/tile)
    - S1: (4, ., ., 2) uint16 LINEAR quarterly composites with
      `s1_weights` the (24, 4) host-precomputed biweekly regrid
      matrix; at half resolution they are bilinearly upsampled on
      device first (the acquisition is 20 m native). Legacy monthly
      stacks (float32 dB or uint16) pass through unchanged
    - DEM slope: fixed-scale uint16 or float32 degrees."""
    from ttc.io.wire import decode_s2_compact, decode_slope_u16

    if s2_10.dtype == jnp.int8:
        s2_10 = decode_s2_compact(s2_10, wire_sc["s2_10"])
    elif s2_10.dtype == jnp.uint16:
        s2_10 = from_uint16(s2_10)
    else:
        s2_10 = s2_10.astype(jnp.float32)
    if s2_20.dtype == jnp.int8:
        s2_20 = decode_s2_compact(s2_20, wire_sc["s2_20"])
    elif s2_20.dtype == jnp.uint16:
        s2_20 = from_uint16(s2_20)
    else:
        s2_20 = s2_20.astype(jnp.float32)
    if dem.dtype == jnp.uint16:
        dem = decode_slope_u16(dem)
    if s1.shape[0] == 4 and s1.dtype == jnp.uint16 \
            and s1_weights is not None:
        lin = from_uint16(s1)
        if lin.shape[1] != dem.shape[0]:       # native 20 m wire
            lin = resize_bilinear(lin, dem.shape[:2])
        db = to_db(lin, 22)
        # 24 biweekly -> 12 monthly: median of each pair == pair mean;
        # composed into the regrid matrix so the (24, H, W, 2)
        # intermediate (lane-padded ~64x on TPU) never materializes
        s1 = apply_regrid(db, 0.5 * (s1_weights[0::2]
                                     + s1_weights[1::2]))
    elif s1.dtype == jnp.uint16:
        s1 = to_db(from_uint16(s1), 22)
    else:
        s1 = s1.astype(jnp.float32)
    dem = median_filter(dem.astype(jnp.float32), 5)
    return assemble_s2(s2_10, s2_20), s1, dem


def _snow_screen_body(sentinel2, valid):
    """Persistent-snow map: 1 only where >=70% of valid dates are snowy
    and not within 2 px of a snow-free area (reference :821-822); plus
    the per-date snow fraction for the removal decision."""
    snow_mask = (snow_filter(sentinel2) > 0).astype(jnp.float32)
    n = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    frac_map = jnp.sum(snow_mask * valid[:, None, None].astype(
        jnp.float32), axis=0) / n
    snow = 1.0 - dilate((frac_map < 0.7).astype(jnp.float32), 2)
    return snow, jnp.mean(snow_mask, axis=(1, 2))


@jax.jit
def _snow_screen(sentinel2):
    return _snow_screen_body(sentinel2,
                             jnp.ones(sentinel2.shape[0], bool))


@jax.jit
def _ard_fused(s2_10, s2_20, s1, dem, valid, s1_weights=None,
               wire_sc=None):
    """The whole masking/gap-fill chain in ONE device dispatch with
    zero host syncs: ingest -> missing/snow decisions -> extreme fill
    -> cloud/shadow masking -> feathered weights -> gap fill ->
    per-date decisions. Dates are fixed-capacity slots gated by
    `valid`; the host reads back one small (5, T) decision bundle and
    re-dispatches the SAME compiled program with an updated mask only
    when dates must be dropped (reference behavior: np.delete + full
    re-run per stage, src/download_and_predict_job.py:641-995)."""
    sentinel2, s1db, demf = _ingest(s2_10, s2_20, s1, dem, s1_weights,
                                    wire_sc)
    kill = id_missing_px(sentinel2, valid, thresh=2)
    snow, snow_frac = _snow_screen_body(sentinel2, valid)
    sentinel2 = fill_extremes_with_median(sentinel2, valid)
    cloudshad, fcps = identify_clouds_shadows(sentinel2, demf,
                                              valid=valid)
    interp15 = interp_weights(cloudshad, 12.0, closing=15)
    interp_frac = jnp.mean(interp15 > 0, axis=(1, 2))
    filled, interp, fully = remove_cloud_and_shadows(
        sentinel2, cloudshad, fcps, valid=valid)
    decisions = jnp.stack([
        kill.astype(jnp.float32),
        snow_frac.astype(jnp.float32),
        interp_frac.astype(jnp.float32),
        fully.astype(jnp.float32),
        valid.astype(jnp.float32),
    ])
    return (jnp.clip(filled, 0, 1), interp, cloudshad, snow, s1db,
            demf / 90.0, decisions)


_BUCKETS = (8, 12, 16, 20, 24)


def _bucket_capacity(t: int) -> int:
    for b in _BUCKETS:
        if t <= b:
            return b
    return t


def process_and_smooth_tile(raw: RawTile, make_shadow: bool = True,
                            max_mask_rounds: int = 3,
                            bucket: bool = True):
    """process_tile + smooth_tile with the smoothing FUSED into the
    ARD dispatch (one device program, one readback) in the common
    no-removal case. Returns (ProcessedTile, SmoothedTile)."""
    return process_tile(raw, make_shadow=make_shadow,
                        max_mask_rounds=max_mask_rounds, bucket=bucket,
                        smooth=True)


def host_prepare(raw: RawTile, make_shadow: bool = True,
                 bucket: bool = True, wire: str = "uint16") -> dict:
    """Host-side half of process_tile: spatial alignment on the compact
    raw dtypes + date-axis bucket padding. Returns the exact arrays
    process_tile uploads (`s2_10 s2_20 s1 dem` keys, still host numpy)
    plus `dates`, `valid`, `t_raw`, `s1_w`. Callers may device_put the
    four arrays themselves (overlapping upload with other work) and
    pass the dict back via process_tile(prepped=...).

    wire="compact" re-encodes the payload with ttc.io.wire (int8
    reference+residual S2 planes, native-resolution S1, uint16 slope:
    ~28 MB instead of 58 MB per production tile; drift-gated by
    tests/test_wire_gate.py) and adds `s2_10_sc`/`s2_20_sc` scale
    arrays. The pipelined predict job ships this as the default."""
    dates = np.asarray(raw.s2_dates)

    width = raw.s2_20.shape[1] * 2
    height = raw.s2_20.shape[2] * 2
    s2_10_h = _adjust_shape(np.asarray(raw.s2_10), width, height)
    if s2_10_h.ndim == 3:
        s2_10_h = s2_10_h[None]
    s1_h = np.atleast_3d(_adjust_shape(np.asarray(raw.s1), width,
                                       height))
    dem_h = _adjust_shape(np.asarray(raw.dem), width, height)
    s2_20_h = np.asarray(raw.s2_20)
    # quarterly uint16 S1 wire format: precompute the biweekly regrid
    # weights for the quarter dates (expansion happens on device)
    s1_w = None
    if s1_h.shape[0] == 4 and s1_h.dtype == np.uint16:
        s1_w = jnp.asarray(
            regrid_weights(np.asarray(raw.s1_dates))[0])

    t_raw = s2_10_h.shape[0]
    cap = _bucket_capacity(t_raw) if bucket and make_shadow else t_raw

    sc_10 = sc_20 = None
    if wire == "compact" and s2_10_h.dtype == np.uint16 \
            and s2_20_h.dtype == np.uint16:
        from ttc.io.wire import (downsample_s1_u16, encode_s2_compact,
                                 encode_slope_u16)

        s2_10_h, sc_10 = encode_s2_compact(s2_10_h)
        s2_20_h, sc_20 = encode_s2_compact(s2_20_h)
        dem_h = encode_slope_u16(dem_h)
        if s1_w is not None and s1_h.shape[1] == dem_h.shape[0]:
            s1_h = downsample_s1_u16(s1_h)
        if cap > t_raw:
            # residual slots pad with zeros (decode to the reference
            # plane; every consumer is validity-gated), scales with 1s
            s2_10_h = np.pad(s2_10_h,
                             ((0, cap - t_raw),) + ((0, 0),) * 3)
            s2_20_h = np.pad(s2_20_h,
                             ((0, cap - t_raw),) + ((0, 0),) * 3)
            sc_10 = np.pad(sc_10, ((0, cap - t_raw), (0, 0)),
                           constant_values=1.0)
            sc_20 = np.pad(sc_20, ((0, cap - t_raw), (0, 0)),
                           constant_values=1.0)
    elif cap > t_raw:
        pad = ((0, cap - t_raw),) + ((0, 0),) * (s2_10_h.ndim - 1)
        s2_10_h = np.pad(s2_10_h, pad)
        s2_20_h = np.pad(s2_20_h, ((0, cap - t_raw),) + ((0, 0),) * 3)
    valid = np.arange(cap) < t_raw
    return dict(s2_10=s2_10_h, s2_20=s2_20_h, s1=s1_h, dem=dem_h,
                s2_10_sc=sc_10, s2_20_sc=sc_20,
                s1_w=s1_w, dates=dates, valid=valid, t_raw=t_raw,
                cap=cap)


def process_tile(raw: RawTile = None, make_shadow: bool = True,
                 max_mask_rounds: int = 3,
                 bucket: bool = True, smooth: bool = False,
                 prepped: dict = None):
    """Raw -> masked/gap-filled datacube.

    One upload of the uint16 stacks, ONE fused device dispatch, ONE
    (5, T) decision readback in the clean-data case. Date removal
    re-dispatches the same compiled program with an updated validity
    mask (no recompiles, no shape changes); `bucket` pads the date
    axis to the next capacity bucket so production tiles share a
    handful of compiled shapes. Outputs are compacted to valid dates,
    preserving the original ProcessedTile contract. With smooth=True
    the regrid/Whittaker/median program fuses into the same dispatch
    and (ProcessedTile, SmoothedTile) is returned. Pass `prepped`
    (from host_prepare, arrays possibly already on device) to skip the
    host prep/upload inside the call."""
    if prepped is None:
        prepped = host_prepare(raw, make_shadow=make_shadow,
                               bucket=bucket)
    s2_10_h, s2_20_h = prepped["s2_10"], prepped["s2_20"]
    s1_h, dem_h, s1_w = prepped["s1"], prepped["dem"], prepped["s1_w"]
    dates, valid = prepped["dates"], prepped["valid"].copy()
    t_raw, cap = prepped["t_raw"], prepped["cap"]
    wire_sc = None
    if prepped.get("s2_10_sc") is not None:
        wire_sc = {"s2_10": jnp.asarray(prepped["s2_10_sc"]),
                   "s2_20": jnp.asarray(prepped["s2_20_sc"])}

    if not make_shadow or t_raw < 3:
        sentinel2, s1, dem = _ingest(jnp.asarray(s2_10_h),
                                     jnp.asarray(s2_20_h),
                                     jnp.asarray(s1_h),
                                     jnp.asarray(dem_h), s1_w,
                                     wire_sc)
        kill = np.asarray(id_missing_px(
            sentinel2, jnp.asarray(valid), thresh=2)).astype(bool)
        valid &= ~kill
        snow, _ = _snow_screen_body(sentinel2, jnp.asarray(valid))
        sentinel2 = fill_extremes_with_median(sentinel2,
                                              jnp.asarray(valid))
        keep = np.flatnonzero(valid)
        dates, sentinel2 = _take_dates(
            np.setdiff1d(np.arange(cap), keep), np.pad(
                dates, (0, cap - t_raw)), sentinel2)
        t, h, w = sentinel2.shape[:3]
        zeros = jnp.zeros((t, h, w), jnp.float32)
        tile = ProcessedTile(jnp.clip(sentinel2, 0, 1), dates, zeros,
                             s1, dem / 90.0, zeros, snow)
        return (tile, smooth_tile(tile)) if smooth else tile

    dates = np.pad(dates, (0, cap - t_raw))
    args = (jnp.asarray(s2_10_h), jnp.asarray(s2_20_h),
            jnp.asarray(s1_h), jnp.asarray(dem_h))

    def dispatch(v):
        if smooth:
            w = jnp.asarray(regrid_weights(dates, v)[0])
            return _ard_smooth_fused(*args, jnp.asarray(v), s1_w, w,
                                     wire_sc)
        return _ard_fused(*args, jnp.asarray(v), s1_w, wire_sc), None

    out, sm = dispatch(valid)
    dec = np.asarray(out[6])                  # the ONE host sync

    # decision cascade (reference :786-832): missing-px kill, then the
    # defunct-unless->10 snow screen
    new_valid = valid & ~(dec[0] > 0)
    snow_rm = (dec[1] > 0.25) & new_valid
    if snow_rm.sum() > 10:
        new_valid &= ~snow_rm
    if not np.array_equal(new_valid, valid) and new_valid.any():
        valid = new_valid
        out, sm = dispatch(valid)
        dec = np.asarray(out[6])

    # masking rounds: drop dates >90% interpolated, re-mask (:849-919)
    for _ in range(max_mask_rounds):
        rm = (dec[2] > 0.9) & valid
        if not rm.any() or rm.all():
            break
        valid = valid & ~rm
        out, sm = dispatch(valid)
        dec = np.asarray(out[6])

    # fully-interpolated dates: mark invalid and reuse the existing
    # masks/fill (the reference re-runs the masker on the reduced
    # stack, :935-995 — an extra full pass that only relabels dates
    # whose pixels are already 100% interpolated; quality-gated by the
    # golden/parity suites)
    fully = (dec[3] > 0) & valid
    fully_fired = fully.any() and not fully.all()
    if fully_fired:
        valid = valid & ~fully

    filled, interp, cloudshad, snow, s1, dem = out[:6]
    if not valid.all():
        keep = np.flatnonzero(valid)
        dates, filled, interp, cloudshad = _take_dates(
            np.setdiff1d(np.arange(cap), keep), dates, filled, interp,
            cloudshad)
    tile = ProcessedTile(filled, dates, interp, s1, dem, cloudshad,
                         snow)
    if not smooth:
        return tile
    if fully_fired:
        # the fused smooth ran with the pre-`fully` validity; redo it
        # on the compacted stack (rare path)
        return tile, smooth_tile(tile)
    out12, s2_median, s1_median, clear_count = sm
    return tile, SmoothedTile(out12, dates, tile.interp, tile.s1,
                              tile.dem, s2_median, s1_median,
                              clear_count)


@jax.jit
def _ard_fused_batch(s2_10, s2_20, s1, dem, valid, s1_weights,
                     wire_sc=None):
    """_ard_fused vmapped over a leading tile axis: B tiles' whole
    masking/gap-fill chains in ONE device dispatch. Each tile's
    computation is independent, so results match the per-tile program;
    batching amortizes dispatch latency and keeps the chip busy
    between tiles (the per-tile program is dominated by many small
    VPU stages)."""
    return jax.vmap(_ard_fused)(s2_10, s2_20, s1, dem, valid,
                                s1_weights, wire_sc)


@jax.jit
def _ard_fused_batch_nos1w(s2_10, s2_20, s1, dem, valid,
                           wire_sc=None):
    def one(a, b, c, d, v, sc):
        return _ard_fused(a, b, c, d, v, None, sc)

    return jax.vmap(one)(s2_10, s2_20, s1, dem, valid, wire_sc)


@jax.jit
def _ard_smooth_fused_batch(s2_10, s2_20, s1, dem, valid, s1_weights,
                            regrid_w, wire_sc=None):
    return jax.vmap(_ard_smooth_fused)(s2_10, s2_20, s1, dem, valid,
                                       s1_weights, regrid_w, wire_sc)


@jax.jit
def _ard_smooth_fused_batch_nos1w(s2_10, s2_20, s1, dem, valid,
                                  regrid_w, wire_sc=None):
    def one(a, b, c, d, v, w, sc):
        return _ard_smooth_fused(a, b, c, d, v, None, w, sc)

    return jax.vmap(one)(s2_10, s2_20, s1, dem, valid, regrid_w,
                         wire_sc)


@jax.jit
def _sr_smooth_fused_batch(sr_params, s2, s1, interp, valid, regrid_w):
    """Batched super-resolution + smoothing tail: sharpen bands 4:10 of
    each tile's fixed-capacity filled stack (the SR CNN treats dates
    independently, so padded slots are discarded unchanged), then the
    full regrid/Whittaker/median program — one dispatch for the whole
    group. Mirrors the per-tile prepare path: process -> SR -> smooth
    (reference: src/download_and_predict_job.py:95-147,1057-1096)."""
    from ttc.models.superres import SuperResolver, superresolve_tile

    model = SuperResolver()

    def one(a, b, c, v, w):
        sr = superresolve_tile(sr_params, a, model)
        return (sr,) + _smooth_body(sr, b, c, w, valid=v)

    return jax.vmap(one)(s2, s1, interp, valid, regrid_w)


def _process_batch(preps, max_mask_rounds: int, smooth: bool,
                   sr_params=None, pad_to=None):
    """Vectorized decision cascade over a batch of same-shape prepped
    tiles. Mirrors process_tile's cascade row-by-row: a re-dispatch
    re-runs EVERY tile with its own updated validity row — idempotent
    for rows that didn't change (the program is deterministic and
    tiles are independent under vmap), so per-tile semantics are
    preserved while all tiles share each device dispatch.

    `pad_to` pads short groups by repeating the last prep (extra
    results dropped) so e.g. an odd tail group reuses the compiled
    tile_batch-sized program instead of paying a cold compile."""
    b_real = len(preps)
    if pad_to is not None and b_real < pad_to:
        preps = list(preps) + [preps[-1]] * (pad_to - b_real)
    b = len(preps)
    cap = preps[0]["cap"]
    dates = np.stack([np.pad(p["dates"], (0, cap - p["t_raw"]))
                      for p in preps])
    valid = np.stack([p["valid"] for p in preps]).copy()
    args = tuple(jnp.stack([jnp.asarray(p[k]) for p in preps])
                 for k in ("s2_10", "s2_20", "s1", "dem"))
    has_s1w = preps[0]["s1_w"] is not None
    s1w = (jnp.stack([jnp.asarray(p["s1_w"]) for p in preps])
           if has_s1w else None)
    wire_sc = None
    if preps[0].get("s2_10_sc") is not None:
        wire_sc = {k: jnp.stack([jnp.asarray(p[f"{k}_sc"])
                                 for p in preps])
                   for k in ("s2_10", "s2_20")}

    def dispatch(v):
        vj = jnp.asarray(v)
        if smooth and sr_params is None:
            w = jnp.asarray(np.stack(
                [regrid_weights(dates[i], v[i])[0] for i in range(b)]))
            if has_s1w:
                return _ard_smooth_fused_batch(*args, vj, s1w, w,
                                               wire_sc)
            return _ard_smooth_fused_batch_nos1w(*args, vj, w,
                                                 wire_sc)
        if has_s1w:
            return _ard_fused_batch(*args, vj, s1w, wire_sc), None
        return _ard_fused_batch_nos1w(*args, vj, wire_sc), None

    out, sm = dispatch(valid)
    dec = np.asarray(out[6])                   # (B, 5, cap), ONE sync

    # kill + snow step (process_tile's cascade, vectorized over rows)
    new_valid = valid & ~(dec[:, 0] > 0)
    snow_rm = (dec[:, 1] > 0.25) & new_valid
    apply_snow = snow_rm.sum(axis=1) > 10
    new_valid = np.where(apply_snow[:, None], new_valid & ~snow_rm,
                         new_valid)
    changed = (new_valid != valid).any(axis=1) & new_valid.any(axis=1)
    if changed.any():
        valid = np.where(changed[:, None], new_valid, valid)
        out, sm = dispatch(valid)
        dec = np.asarray(out[6])

    # interpolation-fraction removal rounds
    for _ in range(max_mask_rounds):
        rm = (dec[:, 2] > 0.9) & valid
        rows = rm.any(axis=1) & ~rm.all(axis=1)
        if not rows.any():
            break
        valid = np.where(rows[:, None], valid & ~rm, valid)
        out, sm = dispatch(valid)
        dec = np.asarray(out[6])

    fully = (dec[:, 3] > 0) & valid
    fully_rows = fully.any(axis=1) & ~fully.all(axis=1)
    valid_final = np.where(fully_rows[:, None], valid & ~fully, valid)

    filled, interp, cloudshad, snow, s1, dem = out[:6]
    if smooth and sr_params is not None:
        # SR interposes between masking and smoothing: one batched
        # SR+smooth dispatch with the FINAL validity (so no rare-path
        # redo is needed)
        w_final = jnp.asarray(np.stack(
            [regrid_weights(dates[i], valid_final[i])[0]
             for i in range(b)]))
        filled, out12, s2_med, s1_med, clear = _sr_smooth_fused_batch(
            sr_params, filled, s1, interp, jnp.asarray(valid_final),
            w_final)
        fully_rows[:] = False
    elif smooth:
        out12, s2_med, s1_med, clear = sm
    results = []
    for i in range(b):
        v = valid_final[i]
        di, fi, ii, ci = dates[i], filled[i], interp[i], cloudshad[i]
        if not v.all():
            keep = np.flatnonzero(v)
            di, fi, ii, ci = _take_dates(
                np.setdiff1d(np.arange(cap), keep), di, fi, ii, ci)
        tile = ProcessedTile(fi, di, ii, s1[i], dem[i], ci, snow[i])
        if not smooth:
            results.append(tile)
        elif fully_rows[i]:
            # fused smooth ran with pre-`fully` validity (rare path)
            results.append((tile, smooth_tile(tile)))
        else:
            results.append((tile, SmoothedTile(
                out12[i], di, tile.interp, tile.s1, tile.dem,
                s2_med[i], s1_med[i], clear[i])))
    return results[:b_real]


def process_tiles(raws=None, make_shadow: bool = True,
                  max_mask_rounds: int = 3, bucket: bool = True,
                  smooth: bool = True, prepped_list=None,
                  sr_params=None, pad_to=None, max_batch=None):
    """Batch B tiles through vmapped fused ARD dispatches.

    Production tiles share geometry (618 px) and a handful of date-axis
    buckets, so most groups batch; tiles that can't share a program
    (different shapes/buckets, <3 dates, quarterly-vs-legacy S1 mix)
    fall back to the single-tile path. With `sr_params`, the 20 m-band
    super-resolution runs batched between masking and smoothing
    (requires smooth=True) — the full production prepare stage as
    grouped device dispatches. Returns a list aligned with the inputs:
    ProcessedTile, or (ProcessedTile, SmoothedTile) when smooth=True."""
    if sr_params is not None and not smooth:
        raise ValueError("sr_params requires smooth=True")
    if prepped_list is None:
        prepped_list = [host_prepare(r, make_shadow=make_shadow,
                                     bucket=bucket) for r in raws]

    def single(p):
        if sr_params is None:
            return process_tile(prepped=p, make_shadow=make_shadow,
                                max_mask_rounds=max_mask_rounds,
                                bucket=bucket, smooth=smooth)
        from ttc.models.superres import superresolve_tile

        tile = process_tile(prepped=p, make_shadow=make_shadow,
                            max_mask_rounds=max_mask_rounds,
                            bucket=bucket, smooth=False)
        tile.s2 = superresolve_tile(sr_params, jnp.asarray(tile.s2))
        return tile, smooth_tile(tile)

    if len(prepped_list) == 1 or not make_shadow:
        return [single(p) for p in prepped_list]

    def sig(p):
        # .shape only — never np.asarray here: prep arrays may already
        # live on device (pipelined upload overlap) and materializing
        # them would read the whole tile back through the host link
        # dtypes matter too: _ingest dispatches decode on dtype
        # (uint16 scale vs float32 passthrough, quarterly uint16 S1 vs
        # legacy float), so mixed-dtype tiles must not share a batch —
        # jnp.stack would silently promote and skip the decode
        return (p["cap"], p["s2_10"].shape[1:], p["s2_20"].shape[1:],
                p["s1"].shape, p["s1_w"] is not None, p["t_raw"] >= 3,
                tuple(str(p[k].dtype) for k in ("s2_10", "s2_20", "s1",
                                                "dem")))

    results = [None] * len(prepped_list)
    groups: dict = {}
    for i, p in enumerate(prepped_list):
        groups.setdefault(sig(p), []).append(i)
    for key, idxs in groups.items():
        # with pad_to, even singleton groups ride the padded batched
        # program (reusing the compiled tile_batch shape) instead of
        # cold-compiling the single-tile program
        if key[5] is False or (len(idxs) == 1 and pad_to is None):
            for i in idxs:
                results[i] = single(prepped_list[i])
            continue
        # max_batch caps the vmap width of the fused ARD program: the
        # smoothing chain materializes a (B, 24, H, W, 10) f32 stack
        # whose 10-wide minor dim lane-pads ~13x on TPU, so B=4 at
        # production geometry exceeds HBM (B=2 is the proven ceiling;
        # the FORWARD still batches the full tile_batch downstream)
        mb = max_batch or len(idxs)
        for s in range(0, len(idxs), mb):
            chunk = idxs[s:s + mb]
            batch = [prepped_list[i] for i in chunk]
            for i, r in zip(chunk, _process_batch(
                    batch, max_mask_rounds, smooth, sr_params,
                    pad_to=pad_to)):
                results[i] = r
    return results


def process_and_smooth_tiles(raws=None, make_shadow: bool = True,
                             max_mask_rounds: int = 3,
                             bucket: bool = True, prepped_list=None,
                             sr_params=None, pad_to=None,
                             max_batch=None):
    """process_and_smooth_tile over a tile batch: ONE vmapped fused
    device dispatch per <=max_batch chunk (plus cascade re-dispatches
    of the same program when any tile drops dates). Returns a list of
    (ProcessedTile, SmoothedTile)."""
    return process_tiles(raws, make_shadow=make_shadow,
                         max_mask_rounds=max_mask_rounds,
                         bucket=bucket, smooth=True,
                         prepped_list=prepped_list,
                         sr_params=sr_params, pad_to=pad_to,
                         max_batch=max_batch)


def _smooth_body(s2, s1, interp, weights, valid=None):
    """Device body of smooth_tile: the whole regrid/smooth/median
    program. `valid` masks fixed-capacity date slots (their regrid
    weights are zero and interp rows are 1, so only the raw medians
    need explicit masking)."""
    raw_idx = idx_ops.all_indices(s2)
    sm = WhittakerSmoother(lmbd=100.0, size=24, outsize=12)
    # composed (12, T) regrid+Whittaker+monthly operator: the (24, H,
    # W, C) biweekly intermediates never materialize (their narrow
    # band dims draw ~13x lane-padded layouts -> HBM OOM at B>=2).
    # The barrier stops XLA from re-associating the matmul chain back
    # into per-program variants (which broke the bit-exact
    # padded==compacted date-axis contract by one ulp)
    cw = jax.lax.optimization_barrier(sm.monthly_weights(weights))
    indices_monthly = apply_regrid(raw_idx, cw)
    bands_monthly = apply_regrid(s2, cw)

    out = jnp.concatenate([bands_monthly, indices_monthly], axis=-1)

    # raw medians for the model's 5th step
    # (reference process_subtiles :1152-1160); sorting-network medians
    # over the small static T axis (no XLA sort)
    if valid is None:
        med_bands = median_axis0(s2)
        med_idx = jnp.stack([
            median_axis0(idx_ops.evi(s2)),
            median_axis0(idx_ops.bi(s2)),
            median_axis0(idx_ops.msavi2(s2)),
            median_axis0(idx_ops.grndvi(s2)),
        ], axis=-1)
    else:
        bad4 = ~valid[:, None, None, None]
        bad3 = ~valid[:, None, None]
        med_bands, _ = masked_median_axis0(s2, bad4)
        med_idx = jnp.stack([
            masked_median_axis0(idx_ops.evi(s2), bad3)[0],
            masked_median_axis0(idx_ops.bi(s2), bad3)[0],
            masked_median_axis0(idx_ops.msavi2(s2), bad3)[0],
            masked_median_axis0(idx_ops.grndvi(s2), bad3)[0],
        ], axis=-1)
    s2_median = jnp.concatenate([med_bands, med_idx], axis=-1)
    s1_median = median_axis0(s1)
    clear_count = jnp.sum(interp < 0.33, axis=0).astype(jnp.float32)
    return (out.astype(jnp.float32), s2_median.astype(jnp.float32),
            s1_median.astype(jnp.float32), clear_count)


_smooth_device = jax.jit(_smooth_body)


@jax.jit
def _ard_smooth_fused(s2_10, s2_20, s1, dem, valid, s1_weights,
                      regrid_w, wire_sc=None):
    """_ard_fused + the smoothing program in one dispatch — the
    whole raw -> model-input chain as a single device program for the
    common no-date-removal case (the host recomputes `regrid_w` and
    re-dispatches when the decision cascade drops dates)."""
    outs = _ard_fused(s2_10, s2_20, s1, dem, valid, s1_weights,
                      wire_sc)
    filled, interp, _, _, s1db, _, _ = outs
    sm = _smooth_body(filled, s1db, interp, regrid_w, valid=valid)
    return outs, sm


def smooth_tile(tile: ProcessedTile) -> SmoothedTile:
    """(T, H, W, 10) irregular -> (12, H, W, 14) monthly smoothed
    (reference smooth_large_tile :1057-1096), plus the raw medians and
    clear-count map consumed by the predictor. All outputs stay on
    device."""
    s2, dates = jnp.asarray(tile.s2), tile.dates
    weights, _ = regrid_weights(dates)
    out, s2_median, s1_median, clear_count = _smooth_device(
        s2, jnp.asarray(tile.s1), jnp.asarray(tile.interp),
        jnp.asarray(weights))
    return SmoothedTile(out, dates, tile.interp, tile.s1, tile.dem,
                        s2_median, s1_median, clear_count)
