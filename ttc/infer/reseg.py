"""Resegmentation: detect and repair seams between neighboring tiles.

Re-implements the core of the four resegment_tiles_* scripts
(reference: src/resegment_tiles_wide.py, resegment_tiles_north_wide.py
and their *_feat variants):

- check_if_artifact: binned edge-profile comparison of a tile's last
  rows/cols against its neighbor's first (reference :675-710)
- align_border_histograms: per-date mean/std alignment of the two
  halves of the border strip, kept only when it reduces the seam step
  (reference :284-343)
- adjust_predictions: mean/std matching of new predictions to the
  existing raster (reference :346-357)
- blend_into_raster: Gaussian re-blend of strip predictions into the
  two existing rasters, producing the _SMOOTH_X / _SMOOTH_Y outputs
  (reference :1169-1550)

In a multi-tile TPU deployment, tiles processed as one sharded block
share halos and rarely need this; it remains for block boundaries and
for repairing rasters produced tile-at-a-time.
"""
from __future__ import annotations

import numpy as np

from ttc.ops.filters import fspecial_gauss

NODATA = 255


def _binned_profile(edge: np.ndarray) -> np.ndarray:
    """Mean of 10-px bins along a 1-D edge strip, NaN-padded to a
    multiple of 10 (reference :682-690)."""
    edge = edge.astype(np.float32)
    pad = (10 - (edge.shape[0] % 10)) // 2
    if edge.shape[0] % 10:
        edge = np.pad(edge, pad, constant_values=np.nan)
    n = (edge.shape[0] // 10) * 10
    return np.nanmean(edge[:n].reshape(-1, 10), axis=1)


def check_if_artifact(tile: np.ndarray, neighbor: np.ndarray) -> bool:
    """True when the boundary between `tile` (left/top) and `neighbor`
    shows a visible seam (reference :675-710). Arrays are (H, W)
    tree-cover rasters; comparison runs on tile[:, -1] vs
    neighbor[:, 0] — transpose for north-south checks."""
    t = np.where(tile == NODATA, np.nan, tile.astype(np.float32))
    nb = np.where(neighbor == NODATA, np.nan, neighbor.astype(np.float32))

    right_mean = np.nanmean(nb[:, :3])
    left_mean = np.nanmean(t[:, -3:])
    right = _binned_profile(nb[:, 0])
    left = _binned_profile(t[:, -1])

    diff = np.abs(right - left)
    frac = np.nanmean(diff > 20)
    frac2 = np.nanmean(diff > 12.5)
    frac_l = np.nanmean(np.abs(right[:15] - left[:15]) > 17.5)
    frac_r = np.nanmean(np.abs(right[-15:] - left[-15:]) > 17.5)
    lr_diff = abs(right_mean - left_mean)

    rule0 = lr_diff > 6
    rule1 = (frac2 > 0.5) and (lr_diff > 1)
    rule2 = ((frac > 0.3) or (frac_l > 0.5) or (frac_r > 0.5)) \
        and (lr_diff > 1)
    return bool(rule0 or rule1 or rule2)


def align_border_histograms(strip: np.ndarray) -> np.ndarray:
    """Mean/std align the two halves of a (T, H, W, C) border strip,
    per date, keeping the adjustment only when it shrinks the seam step
    (reference :284-343). The split axis is axis=2 (W)."""
    strip = strip.copy()
    half = strip.shape[2] // 2
    mid_row = strip.shape[2] // 2

    def _ndwi(a):
        return (a[..., 1] - a[..., 3]) / (a[..., 1] + a[..., 3] + 1e-9)

    left_water = _ndwi(np.median(strip[:, :, half:], axis=0)) >= 0.1
    right_water = _ndwi(np.median(strip[:, :, :half], axis=0)) >= 0.1

    for t in range(strip.shape[0]):
        left = strip[t, :, half:]
        right = strip[t, :, :half]
        std_r = np.nanstd(right[~right_water], axis=0)
        std_l = np.nanstd(left[~left_water], axis=0)
        std_ref = (std_r + std_l) / 2
        mean_r = np.nanmean(right[~right_water], axis=0)
        mean_l = np.nanmean(left[~left_water], axis=0)
        mean_ref = (mean_r + mean_l) / 2

        mult_l = std_l / np.maximum(std_ref, 1e-9)
        add_l = mean_l - mean_ref * mult_l
        mult_r = std_r / np.maximum(std_ref, 1e-9)
        add_r = mean_r - mean_ref * mult_r

        seam_before = np.mean(np.abs(
            strip[t, :, mid_row] - strip[t, :, mid_row - 1]))
        cand = strip[t].copy()
        # note reference applies the *left* multipliers to the first
        # half; replicated as-is
        cand[:, :half] = cand[:, :half] * mult_l + add_l
        cand[:, half:] = cand[:, half:] * mult_r + add_r
        seam_after = np.mean(np.abs(
            cand[:, mid_row] - cand[:, mid_row - 1]))
        if seam_after < seam_before:
            strip[t] = cand
    return strip


def adjust_predictions(preds: np.ndarray, ref: np.ndarray) -> np.ndarray:
    """Scale new predictions to the existing raster's mean/std
    (reference :346-357)."""
    std_mult = np.nanstd(ref) / max(np.nanstd(preds), 1e-9)
    addition = np.nanmean(ref) - np.nanmean(preds) * std_mult
    return np.clip(preds * std_mult + addition, 0, 1)


def blend_strip_into_rasters(left_raster: np.ndarray,
                             right_raster: np.ndarray,
                             strip_preds: np.ndarray,
                             strip_width: int,
                             sigma: float | None = None):
    """Gaussian re-blend of a border strip prediction (H, 2*strip_width)
    spanning the last strip_width cols of the left tile and first of the
    right (reference mosaic_subtiles / recreate_resegmented_tifs
    :1169-1550, distilled). Returns the two updated rasters
    (the reference writes them as *_SMOOTH_X)."""
    h = left_raster.shape[0]
    w = strip_width
    if sigma is None:
        # keep the reference's decay-to-zero profile at any strip
        # width (36 px sigma at the production width of 158)
        sigma = 36.0 / 158.0 * w
    ramp = fspecial_gauss(2 * w, sigma)[0]
    ramp = ramp / ramp.max()
    # weight ~1 at the seam, decaying outward
    weight = np.concatenate([ramp[:w][::-1], ramp[:w]])[None, :]
    weight = np.repeat(weight[:, :w * 2], 1, axis=0)
    weight = np.broadcast_to(
        np.concatenate([ramp[w:][::-1], ramp[w:]])[None, :], (h, 2 * w))

    def _blend(raster, cols, new_vals, wgt):
        region = raster[:, cols].astype(np.float32)
        valid = region != NODATA
        blended = region * (1 - wgt) + new_vals * 100.0 * wgt
        out = np.where(valid, blended, new_vals * 100.0)
        updated = raster.copy()
        updated[:, cols] = np.clip(out, 0, 100).astype(raster.dtype)
        return updated

    left_new = _blend(left_raster, slice(-w, None),
                      strip_preds[:, :w], weight[:, :w])
    right_new = _blend(right_raster, slice(0, w),
                       strip_preds[:, w:], weight[:, w:])
    return left_new, right_new


def resegment_pair(left_raster, right_raster, strip_predict_fn,
                   strip_width: int = 158):
    """Seam-repair driver for one east-west tile pair: detect, repredict
    the border strip via `strip_predict_fn()` (-> (H, 2*strip_width)
    float [0,1] predictions), align to the existing rasters, blend.

    Returns (left, right, repaired: bool).
    """
    if not check_if_artifact(left_raster, right_raster):
        return left_raster, right_raster, False
    preds = strip_predict_fn()
    ref = np.concatenate([left_raster[:, -strip_width:],
                          right_raster[:, :strip_width]], axis=1)
    ref_f = np.where(ref == NODATA, np.nan, ref / 100.0)
    preds = adjust_predictions(preds, ref_f)
    left_new, right_new = blend_strip_into_rasters(
        left_raster, right_raster, preds, strip_width)
    return left_new, right_new, True


# ------------------------------------------------------------------
# Strip re-prediction from stored ARD borders (no re-download):
# predict_job saves each tile's east/south border of the smoothed
# inputs; a seam repair stitches the two borders into one strip tile
# and runs the normal window predictor over it.

BORDER_FILES = ("s2", "s1", "slope", "s2_median", "s1_median",
                "clear_count")


def _edge_slice(arr, edge: str, width: int):
    """Slice a smoothed-input array's border. W axis = last spatial
    axis; H axis = first spatial axis. Arrays are (T, H, W, C),
    (H, W, C) or (H, W)."""
    ndim = np.ndim(arr)
    h_axis = 1 if ndim == 4 else 0
    w_axis = h_axis + 1
    axis = w_axis if edge in ("east", "west") else h_axis
    sl = [slice(None)] * ndim
    sl[axis] = slice(-width, None) if edge in ("east", "south") \
        else slice(0, width)
    # slice first (device-side for jax.Arrays), download only the edge
    return np.asarray(arr[tuple(sl)])


def save_border_strips(store, x, y, sm, width: int = 172):
    """Persist all four borders of a tile's smoothed inputs
    (ttc.preprocess.ard.SmoothedTile) for later seam repair."""
    import os

    from ttc.io.arrays import save_array

    base = os.path.join(store.tile_dir(x, y), "reseg")
    arrays = {"s2": sm.s2, "s1": sm.s1, "slope": sm.dem,
              "s2_median": sm.s2_median, "s1_median": sm.s1_median,
              "clear_count": sm.clear_count}
    for edge in ("east", "west", "south", "north"):
        for name, arr in arrays.items():
            save_array(os.path.join(base, f"{edge}_{name}.h5"),
                       _edge_slice(arr, edge, width))


def load_border_strips(store, x, y, edge: str):
    """Load one tile's stored border bundle, or None if absent."""
    import os

    from ttc.io.arrays import load_array

    base = os.path.join(store.tile_dir(x, y), "reseg")
    out = {}
    for name in BORDER_FILES:
        path = os.path.join(base, f"{edge}_{name}.h5")
        if not os.path.exists(path):
            return None
        out[name] = load_array(path)
    return out


def seam_diff(left_raster: np.ndarray, right_raster: np.ndarray,
              edge_px: int = 8) -> float:
    """Mean |column-mean| step across the seam, the reference's
    before/after repair quality metric (reference:
    resegment_tiles_wide.py:1763-1773): nanmean over the left tile's
    last `edge_px` columns vs the right tile's first."""
    l = left_raster[:, -edge_px:].astype(np.float32)
    r = right_raster[:, :edge_px].astype(np.float32)
    l = np.where(l == NODATA, np.nan, l)
    r = np.where(r == NODATA, np.nan, r)
    return float(np.nanmean(np.abs(np.nanmean(r, axis=1)
                                   - np.nanmean(l, axis=1))))


def update_ard_tiles(left_dir: str, right_dir: str,
                     direction: str = "x", width: int = 158,
                     smooth_rows: int = 32) -> bool:
    """Patch both tiles' stored change-detection ARD after a seam
    repair so downstream change detection sees the seam-consistent
    data the repaired rasters came from.

    Counterpart of the reference's update_ard_tiles (reference:
    resegment_tiles_wide.py:793-846), which re-downloads the middle
    strip and linearly cross-fades it into both tiles' 13-band
    ard.hkl. Our artifact schema stores per-date NDMI stacks
    (ard_ndmi.h5, int16) instead of full-band ARD, and our repair
    re-predicts from stored borders rather than re-downloading — so
    the equivalent operation is: estimate the per-row NDMI step at
    the seam from the two stacks' temporal medians and remove it with
    the same linear ramp the reference uses for its cross-fade (1 at
    the seam, 0 at `width` px in). Each tile keeps its own dates (the
    stacks' T may differ).

    Returns True when both stacks existed and were patched.
    """
    import os

    from ttc.io.arrays import load_array, save_array

    paths = [os.path.join(d, "ard_ndmi.h5") for d in (left_dir,
                                                      right_dir)]
    if not all(os.path.exists(p) for p in paths):
        return False
    left = load_array(paths[0]).astype(np.float32)
    right = load_array(paths[1]).astype(np.float32)
    if direction == "y":
        left = np.swapaxes(left, 1, 2)
        right = np.swapaxes(right, 1, 2)

    w = min(width, left.shape[2] // 2, right.shape[2] // 2)
    # per-row seam step from temporal medians of the innermost 3 cols
    lm = np.nanmedian(left[:, :, -3:], axis=(0, 2))
    rm = np.nanmedian(right[:, :, :3], axis=(0, 2))
    delta = rm - lm  # (H,)
    # box-smooth along rows so the correction follows the landscape,
    # not per-pixel noise
    k = max(1, smooth_rows)
    kernel = np.ones(k, np.float32) / k
    delta = np.convolve(np.pad(delta, k // 2, mode="edge"), kernel,
                        mode="same")[k // 2: k // 2 + left.shape[1]]
    ramp = 1.0 - np.arange(w, dtype=np.float32) / w  # 1 at seam -> 0
    # each tile moves half the step toward the other, faded outward
    left[:, :, -w:] += (delta[:, None] / 2) * ramp[::-1][None, :]
    right[:, :, :w] -= (delta[:, None] / 2) * ramp[None, :]

    if direction == "y":
        left = np.swapaxes(left, 1, 2)
        right = np.swapaxes(right, 1, 2)
    # requantize with the production codec (int16 x 10000, steps of 5)
    from ttc.core.codecs import ndmi_to_int16

    save_array(paths[0], ndmi_to_int16(left / 10000.0))
    save_array(paths[1], ndmi_to_int16(right / 10000.0))
    return True


def update_border_strips(store, left_xy, right_xy, aligned_s2,
                         direction: str = "x") -> bool:
    """Write the histogram-aligned strip s2 back into the two tiles'
    stored border bundles, so later repair passes (and the y-pass
    after an x-pass) start from seam-consistent ARD — the
    border-bundle analogue of the reference's stored-ARD patch
    (reference: resegment_tiles_wide.py:793-846).

    `aligned_s2` is the (T, H, 2*width, C) strip in the east-west
    frame returned by align_border_histograms (left tile's trailing
    edge in the first half of axis 2)."""
    import os

    from ttc.io.arrays import load_array, save_array

    half = aligned_s2.shape[2] // 2
    la, ra = aligned_s2[:, :, :half], aligned_s2[:, :, half:]
    if direction == "y":
        # rotate back from the east-west frame (see ard_strip_predictor)
        la, ra = np.swapaxes(la, 1, 2), np.swapaxes(ra, 1, 2)
        edges = ("south", "north")
    else:
        edges = ("east", "west")
    # the aligned strip covers the innermost `half` px of each stored
    # bundle — patch in place (near-seam slice first for east/south)
    seam_axis = 1 if direction == "y" else 2
    updates = ((left_xy, edges[0], la), (right_xy, edges[1], ra))
    paths = [os.path.join(store.tile_dir(x, y), "reseg",
                          f"{edge}_s2.h5")
             for (x, y), edge, _ in updates]
    # both-or-neither: writing only the left bundle would leave a
    # partial, seam-inconsistent patch for later passes
    if not all(os.path.exists(p) for p in paths):
        return False
    for path, (_, edge, arr) in zip(paths, updates):
        stored = load_array(path).astype(np.float32)
        sl = [slice(None)] * stored.ndim
        sl[seam_axis] = slice(-arr.shape[seam_axis], None) \
            if edge in ("east", "south") else \
            slice(0, arr.shape[seam_axis])
        stored[tuple(sl)] = arr
        save_array(path, stored)
    return True


def ard_strip_predictor(store, left_xy, right_xy, params, model=None,
                        direction: str = "x", strip_width: int = 158):
    """Build a strip-predict callable from stored border ARD: the
    innermost `strip_width` columns of the left tile's trailing edge +
    of the right tile's leading edge, histogram-aligned at the seam,
    through the normal window predictor. The returned callable yields
    an (H, 2*strip_width) strip matching resegment_pair's contract,
    and exposes `.strip_width` (clamped when the stored borders are
    narrower) and, after a call, `.aligned_s2`. Returns None when
    either border bundle is missing (caller falls back to blending)."""
    left = load_border_strips(store, *left_xy,
                              "east" if direction == "x" else "south")
    right = load_border_strips(store, *right_xy,
                               "west" if direction == "x" else "north")
    if left is None or right is None:
        return None

    import jax

    from ttc.core.config import InferenceConfig
    from ttc.infer.pipeline import TilePredictor
    from ttc.models.unet import inference_model

    def _seam_axis_len(bundle):
        arr = bundle["s2"]
        return arr.shape[1 if direction == "y" else 2]

    strip_width = min(strip_width, _seam_axis_len(left),
                      _seam_axis_len(right))

    def _cat(name, axis):
        la, ra = left[name], right[name]
        if direction == "y":
            # rotate north-south into the east-west frame
            la = np.swapaxes(la, axis - 1, axis) \
                if la.ndim > 2 else la.T
            ra = np.swapaxes(ra, axis - 1, axis) \
                if ra.ndim > 2 else ra.T
        # innermost strip_width columns on each side of the seam
        sl = [slice(None)] * la.ndim
        sl[axis] = slice(-strip_width, None)
        la = la[tuple(sl)]
        sl[axis] = slice(0, strip_width)
        ra = ra[tuple(sl)]
        return np.concatenate([la, ra], axis=axis)

    def _fn():
        s2 = _cat("s2", 2)
        s1 = _cat("s1", 2)
        slope = _cat("slope", 1)
        s2m = _cat("s2_median", 1)
        s1m = _cat("s1_median", 1)
        cc = _cat("clear_count", 1)

        s2 = np.asarray(align_border_histograms(s2))
        _fn.aligned_s2 = s2  # for update_border_strips after repair
        hw = s2.shape[1]
        w = s2.shape[2]
        # predictor geometry on the strip: out windows tile the strip.
        # U-Net skip crops need (out + 14) % 4 == 0, i.e. out % 4 == 2.
        # the predictor runs on a square tile: pad both spatial axes
        # (reflect) up to S = max(H, 2*strip_width), crop after
        s = max(hw, w)
        out = min(strip_width, s // 2)
        out -= (out - 2) % 4
        n_rows = max(2, int(np.ceil((s - out) / out)) + 1)
        cfg = InferenceConfig(tile_px=s, out_size=out, n_rows=n_rows)
        model_ = model or inference_model()
        predictor = TilePredictor(params, cfg, model_)

        def pad_to(a, h_axis):
            for ax in (h_axis, h_axis + 1):
                need = s - a.shape[ax]
                if need > 0:
                    pad = [(0, 0)] * a.ndim
                    pad[ax] = (0, need)
                    mode = "reflect" if need < a.shape[ax] else "edge"
                    a = np.pad(a, pad, mode=mode)
            return a

        s2 = pad_to(s2, 1)
        s1 = pad_to(s1, 1)
        slope = pad_to(slope, 0)
        s2m = pad_to(s2m, 0)
        s1m = pad_to(s1m, 0)
        cc = pad_to(cc, 0)
        # stash the assembled strip inputs for the *_feat regeneration
        # path (regenerate_strip_features)
        _fn.model_inputs = (s2, s1, slope, s2m, s1m, cfg, hw, w)
        _fn.params = params
        _fn.model = model_

        raster = np.asarray(predictor(s2, s1, slope, s2m, s1m, cc))
        raster = raster[:hw, :w].astype(np.float32)
        out_strip = np.where(raster == 255, np.nan, raster / 100.0)
        out_strip = np.where(np.isnan(out_strip), 0.5, out_strip)
        return out_strip

    _fn.strip_width = strip_width
    return _fn


def regenerate_strip_features(predict_fn, store, left_xy, right_xy,
                              direction: str = "x"):
    """Regenerate the 32-ch feature rasters for an accepted strip
    repair and patch both tiles' stored feats seam-side (the
    reference's *_feat reseg variants,
    reference: src/resegment_tiles_wide_feat.py:530-545).

    Uses the strip inputs the ARD strip predictor assembled for the
    repair itself, runs the model with feature taps over the same
    windows, Gaussian-mosaics the early/late maps at strip geometry,
    and writes the innermost strip_width px of each tile's
    feats/{early,late}.npy. Returns True when both tiles' stored
    feature rasters were patched."""
    import os

    import jax.numpy as jnp

    inputs = getattr(predict_fn, "model_inputs", None)
    if inputs is None:
        return False
    paths = {}
    for xy in (left_xy, right_xy):
        d = os.path.join(store.tile_dir(*xy), "feats")
        pair = (os.path.join(d, "early.npy"),
                os.path.join(d, "late.npy"))
        if not all(os.path.exists(p) for p in pair):
            return False
        paths[xy] = pair

    from ttc.core.bands import NORM_MAX, NORM_MIN
    from ttc.infer.mosaic import extract_tile_features
    from ttc.infer.pipeline import quarterly_medians
    from ttc.infer.windows import build_model_inputs, normalize

    s2, s1, slope, s2m, s1m, cfg, hw, w = inputs
    batch, _ = build_model_inputs(
        quarterly_medians(jnp.asarray(s2)),
        quarterly_medians(jnp.asarray(s1)),
        jnp.asarray(s2m), jnp.asarray(s1m), jnp.asarray(slope), cfg)
    norm = normalize(batch, NORM_MIN, NORM_MAX)
    early, late, _ = extract_tile_features(
        predict_fn.params, norm, predict_fn.model, cfg)
    early = np.asarray(early)[:hw, :w]
    late = np.asarray(late)[:hw, :w]

    half = w // 2
    axis = 0 if direction == "y" else 1
    for side, xy in (("left", left_xy), ("right", right_xy)):
        sl_strip = slice(0, half) if side == "left" \
            else slice(half, None)
        e_half, l_half = early[:, sl_strip], late[:, sl_strip]
        if direction == "y":
            # rotate back from the east-west working frame
            e_half = np.swapaxes(e_half, 0, 1)
            l_half = np.swapaxes(l_half, 0, 1)
        # left tile: patch its trailing (east/south) edge; right tile:
        # its leading (west/north) edge
        for path, patch in zip(paths[xy], (e_half, l_half)):
            stored = np.load(path)
            sl = [slice(None)] * stored.ndim
            extent = patch.shape[axis]
            sl[axis] = slice(-extent, None) \
                if side == "left" else slice(0, extent)
            stored[tuple(sl)] = patch
            np.save(path, stored)
    return True
