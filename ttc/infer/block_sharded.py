"""Cross-chip seam-free block prediction: shard_map + ICI halo exchange.

`ttc.infer.block.BlockPredictor` removes interior seams by predicting a
G x G super-tile as one program, but it is capped by single-chip memory
(a 2x2 block is ~4 GB of activations; 4x4 cannot run on one chip). This
module is the multi-chip version — SURVEY §7 step 6's "shard_map over a
patch grid with halo exchange", the TPU-native replacement for the
reference's four resegmentation scripts
(reference: src/resegment_tiles_wide.py:675-1550 et al.):

- The block raster is partitioned into `ndev` horizontal strips over a
  1-D ``Mesh((ndev,), ("rows",))``; every input rides its strip
  (``P("rows")`` on the H axis) so no chip ever holds the whole block.
- Each device owns ``n_rows/ndev`` consecutive window rows. The rows of
  input they read beyond the strip (window overlap + reflect halo) are
  fetched from the neighbor chips with ``lax.ppermute`` over ICI —
  reflect padding is fabricated only at the true block edges, exactly
  like the single-chip program fabricates it at its array edges.
- The Gaussian + agreement mosaic is computed as per-strip partial
  sums that are halo-exchanged and combined. Window extents overlap at
  most 2x2, so scatters are decomposed into four parity planes
  (even/odd window row x even/odd window column); within a plane every
  pixel is covered by at most ONE window anywhere on the mesh, which
  makes the cross-device combine an exact x+0 float addition. The
  final blend is the fixed expression ((P00+P01)+(P10+P11)) on every
  mesh size, so the raster is bit-identical for any device count
  (tests/test_block_sharded.py pins ndev=4 == ndev=1).
- The agreement reweighting needs a global median over all windows'
  disagreement ratios: the (tiny) per-window ratios are all_gathered in
  window order and the median computed redundantly on every chip.
- The model forward runs under ``lax.map`` over the device's window
  rows (one (n_cols, 5, in, in, 17) batch per step) so the program
  compiles one forward regardless of strip size and per-window results
  are independent of how many devices share the block.

Against `BlockPredictor` the raster can differ by the last float ulp
(different summation trees in the mosaic), which after uint8
quantization means a sparse sprinkling of ±1 steps — the strict
equality contract is across mesh sizes of THIS program.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:                                    # jax >= 0.8
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=False)
except ImportError:                     # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_rep=False)

from ttc.core.bands import NORM_MAX, NORM_MIN
from ttc.core.config import InferenceConfig
from ttc.core.windows import window_grid
from ttc.infer.block import block_config, split_block_raster, stitch_tiles
from ttc.infer.mosaic import NODATA
from ttc.infer.pipeline import clear_count_mask, quarterly_medians
from ttc.infer.windows import normalize
from ttc.models.unet import TreeCoverNet
from ttc.ops.filters import fspecial_gauss
from ttc.ops.morphology import dilate
from ttc.preprocess.masks import bright_surface_weight

AXIS = "rows"


@dataclasses.dataclass(frozen=True)
class StripGeometry:
    """Static strip/halo geometry for a block sharded over ndev chips.

    All row coordinates are in "padded" block space for the input side
    (the block reflect-padded by cfg.halo, matching
    ttc.infer.windows.pad_tile) and raw block space for the output
    side.
    """

    ndev: int
    hs: int                 # strip height (block H / ndev)
    rpd: int                # window rows per device
    xs: tuple               # window anchors (shared by rows and cols)
    in_win: int             # model input window (out + ctx)
    out: int                # model output window
    halo: int               # reflect halo (cfg.halo)
    in_lead: int            # input rows needed before the strip
    in_trail: int           # input rows needed after the strip
    out_lead: int           # mosaic rows written before the strip
    out_trail: int          # mosaic rows written after the strip
    roff: tuple             # (ndev, rpd) window row offsets in ext coords
    oroff: tuple            # (ndev, rpd) output row offsets in oext coords

    @property
    def ext_rows(self) -> int:
        return self.hs + self.in_lead + self.in_trail

    @property
    def oext_rows(self) -> int:
        return self.hs + self.out_lead + self.out_trail


def strip_geometry(block_cfg: InferenceConfig, ndev: int) -> StripGeometry:
    """Derive (and validate) the halo-exchange geometry.

    Raises ValueError when the decomposition needs more than one-hop
    neighbor exchange (strips too thin for the window size) — callers
    should lower ndev or raise the block size.
    """
    h, n_rows = block_cfg.tile_px, block_cfg.n_rows
    out, in_win, halo = (block_cfg.out_size, block_cfg.in_size,
                         block_cfg.halo)
    if h % ndev or n_rows % ndev:
        raise ValueError(
            f"block of {h} px / {n_rows} window rows does not split "
            f"over {ndev} devices")
    hs, rpd = h // ndev, n_rows // ndev
    xs = window_grid(h, out, n_rows)

    in_lead = max(d * hs + halo - int(xs[d * rpd])
                  for d in range(ndev))
    in_trail = max(int(xs[(d + 1) * rpd - 1]) + in_win
                   - ((d + 1) * hs + halo) for d in range(ndev))
    out_lead = max(0, max(d * hs - int(xs[d * rpd])
                          for d in range(ndev)))
    out_trail = max(0, max(int(xs[(d + 1) * rpd - 1]) + out
                           - (d + 1) * hs for d in range(ndev)))
    for name, v in (("in_lead", in_lead), ("in_trail", in_trail)):
        if v > hs:
            raise ValueError(
                f"{name}={v} exceeds the {hs} px strip: one-hop halo "
                f"exchange impossible with ndev={ndev}")
    if out_lead + out_trail > hs:
        raise ValueError(
            f"mosaic spill band {out_lead + out_trail} exceeds the "
            f"{hs} px strip with ndev={ndev}")
    # no window may contribute beyond the one-hop exchange region
    for d in range(ndev - 2):
        if int(xs[(d + 2) * rpd]) < (d + 1) * hs + out_trail:
            raise ValueError(
                f"window row {(d + 2) * rpd} reaches two strips back "
                f"with ndev={ndev}")
    for d in range(2, ndev):
        if int(xs[(d - 1) * rpd - 1]) + out > d * hs - out_lead:
            raise ValueError(
                f"window row {(d - 1) * rpd - 1} reaches two strips "
                f"ahead with ndev={ndev}")

    roff, oroff = [], []
    for d in range(ndev):
        ext0 = d * hs + halo - in_lead
        oext0 = d * hs - out_lead
        ro = [int(xs[d * rpd + j]) - ext0 for j in range(rpd)]
        oo = [int(xs[d * rpd + j]) - oext0 for j in range(rpd)]
        assert all(0 <= r and r + in_win <= hs + in_lead + in_trail
                   for r in ro), (d, ro)
        assert all(0 <= o and o + out <= hs + out_lead + out_trail
                   for o in oo), (d, oo)
        roff.append(tuple(ro))
        oroff.append(tuple(oo))
    return StripGeometry(ndev=ndev, hs=hs, rpd=rpd,
                         xs=tuple(int(x) for x in xs), in_win=in_win,
                         out=out, halo=halo, in_lead=in_lead,
                         in_trail=in_trail, out_lead=out_lead,
                         out_trail=out_trail, roff=tuple(roff),
                         oroff=tuple(oroff))


def _fwd_perm(ndev):
    return [(d, d + 1) for d in range(ndev - 1)]


def _bwd_perm(ndev):
    return [(d + 1, d) for d in range(ndev - 1)]


def _exchange_rows(x, lead: int, trail: int, didx, ndev: int,
                   top_fill, bot_fill):
    """Extend a (rows, ...) local strip by `lead` rows of the previous
    device's bottom and `trail` rows of the next device's top, moved
    over ICI with ppermute. The first/last device substitute
    `top_fill`/`bot_fill` (reflect continuation at the true block
    edge)."""
    parts = [x]
    if lead:
        recv_prev = lax.ppermute(x[-lead:], AXIS, _fwd_perm(ndev))
        parts.insert(0, jnp.where(didx == 0, top_fill, recv_prev))
    if trail:
        recv_next = lax.ppermute(x[:trail], AXIS, _bwd_perm(ndev))
        parts.append(jnp.where(didx == ndev - 1, bot_fill, recv_next))
    return jnp.concatenate(parts, axis=0)


def _reflect_fills(x, lead: int, trail: int, halo: int):
    """Reflect-continuation fillers for the true block edges, matching
    jnp.pad(..., mode='reflect') of the whole block: padded row p<halo
    is block row halo-p; rows beyond that are never read by any window
    and are zero-filled."""
    zeros_top = jnp.zeros((max(lead - halo, 0),) + x.shape[1:], x.dtype)
    k = min(lead, halo)
    top = jnp.concatenate([zeros_top, x[1:k + 1][::-1]], axis=0) \
        if lead else None
    zeros_bot = jnp.zeros((max(trail - halo, 0),) + x.shape[1:],
                          x.dtype)
    m = min(trail, halo)
    bot = jnp.concatenate([x[-m - 1:-1][::-1], zeros_bot], axis=0) \
        if trail else None
    return top, bot


def _scatter_planes(vals, row_offsets, row_idx0, g: StripGeometry,
                    width: int):
    """Scatter per-window (out, out) values into four parity planes.

    vals: (rpd, n_cols, out, out). Within one (row parity, col parity)
    plane no two window extents overlap — anywhere on the mesh — so
    every accumulation is an exact x+0 float add and the plane content
    is independent of the device partitioning. Returns (4, oext, W).
    """
    n_cols = vals.shape[1]
    oext = g.oext_rows
    planes = jnp.zeros((2, 2, oext, width), vals.dtype)
    for j in range(g.rpd):
        row_strips = [jnp.zeros((g.out, width), vals.dtype),
                      jnp.zeros((g.out, width), vals.dtype)]
        for c in range(n_cols):
            cp = c % 2
            row_strips[cp] = lax.dynamic_update_slice(
                row_strips[cp], vals[j, c], (0, g.xs[c]))
        rp = (row_idx0 + j) % 2        # global window-row parity
        for cp in range(2):
            for rpv in range(2):
                cur = lax.dynamic_slice(
                    planes[rpv, cp], (row_offsets[j], 0),
                    (g.out, width))
                upd = jnp.where(rp == rpv, cur + row_strips[cp], cur)
                planes = planes.at[rpv, cp].set(lax.dynamic_update_slice(
                    planes[rpv, cp], upd, (row_offsets[j], 0)))
    return planes.reshape(4, oext, width)


def _exchange_planes(planes, g: StripGeometry, didx):
    """Halo-combine partial parity planes across neighbor devices.

    Each plane's pixels receive a nonzero value from at most one device
    (windows within a plane never overlap), so adding the neighbors'
    spill bands is float-exact regardless of order."""
    band = g.out_lead + g.out_trail
    if band == 0:
        return planes
    hs, oe = g.hs, g.oext_rows
    recv_prev = lax.ppermute(planes[:, hs:oe], AXIS,
                             _fwd_perm(g.ndev))
    recv_next = lax.ppermute(planes[:, :band], AXIS,
                             _bwd_perm(g.ndev))
    planes = planes.at[:, :band].add(
        jnp.where(didx == 0, 0.0, recv_prev))
    planes = planes.at[:, hs:oe].add(
        jnp.where(didx == g.ndev - 1, 0.0, recv_next))
    return planes


def _combine(planes):
    """The fixed fp-association ((P00+P01)+(P10+P11)) used on every
    mesh size — the root of the cross-ndev bit-stability contract."""
    return (planes[0] + planes[1]) + (planes[2] + planes[3])


def predict_block_strip(params, s2, s1, dem, s2_med, s1_med, clear, *,
                        model: TreeCoverNet, g: StripGeometry,
                        width: int, sigma: float = 36.0):
    """SPMD body: one device's strip of the seam-free block program.

    Inputs are the local shards of the stitched block (rows axis
    sharded): s2/s1 (12, hs, W, C), dem/s2_med/s1_med/clear (hs, W[,C]).
    Returns the (hs, W) uint8 strip of the block raster.
    """
    didx = lax.axis_index(AXIS)
    h7 = g.halo

    # band assembly on the local strip (pixelwise -> no halo needed yet)
    s2_q = quarterly_medians(s2)
    s1_q = quarterly_medians(s1)
    steps = jnp.concatenate([s2_q, s2_med[None]], axis=0)
    s1_steps = jnp.concatenate([s1_q, s1_med[None]], axis=0)
    dem5 = jnp.broadcast_to(dem[None, :, :, None],
                            (5,) + dem.shape + (1,))
    full = jnp.concatenate([steps[..., :10], dem5, s1_steps,
                            steps[..., 10:]], axis=-1)   # (5, hs, W, 17)
    # reflect-pad the unsharded W axis like pad_tile, then fetch the
    # row halos from the neighbor chips
    full = jnp.pad(full, [(0, 0), (0, 0), (h7, h7), (0, 0)],
                   mode="reflect")
    full = jnp.moveaxis(full, 1, 0)                      # rows first
    top, bot = _reflect_fills(full, g.in_lead, g.in_trail, h7)
    ext = _exchange_rows(full, g.in_lead, g.in_trail, didx, g.ndev,
                         top, bot)
    ext = jnp.moveaxis(ext, 0, 1)                  # (5, ext_rows, Wp, 17)

    clear_p = jnp.pad(clear[..., None], [(0, 0), (h7, h7), (0, 0)],
                      mode="reflect")
    ctop, cbot = _reflect_fills(clear_p, g.in_lead, g.in_trail, h7)
    ext_clear = _exchange_rows(clear_p, g.in_lead, g.in_trail, didx,
                               g.ndev, ctop, cbot)[..., 0]

    n_cols = len(g.xs)
    roffs = jnp.asarray(g.roff)[didx]                    # (rpd,)
    oroffs = jnp.asarray(g.oroff)[didx]
    mn = jnp.asarray(NORM_MIN, jnp.float32)
    mx = jnp.asarray(NORM_MAX, jnp.float32)

    def one_row_group(roff):
        """Extract + forward + post-process one window row (n_cols
        windows). Runs under lax.map so the forward compiles once and
        per-window math is identical for every strip size."""
        strip = lax.dynamic_slice_in_dim(ext, roff, g.in_win, axis=1)
        wins = jnp.stack([
            lax.slice_in_dim(strip, c, c + g.in_win, axis=2)
            for c in g.xs], axis=0)            # (n_cols, 5, in, in, 17)
        cstrip = lax.dynamic_slice_in_dim(ext_clear, roff, g.in_win,
                                          axis=0)
        cwins = jnp.stack([cstrip[:, c:c + g.in_win] for c in g.xs],
                          axis=0)
        preds = model.apply(params, normalize(wins, mn, mx))
        preds = preds.astype(jnp.float32)
        bright = jax.vmap(
            lambda w: bright_surface_weight(w, h7))(wins)
        preds = preds * bright
        nodata_mask = jax.vmap(
            lambda cw: clear_count_mask(cw, g.out))(cwins)
        dead = jnp.median(cwins.reshape(n_cols, -1), axis=1) < 1
        preds = jnp.where(dead[:, None, None], NODATA, preds)
        preds = jnp.where(nodata_mask, NODATA, preds)
        return preds

    preds = lax.map(one_row_group, roffs)     # (rpd, n_cols, out, out)

    # ---- sharded Gaussian + agreement mosaic ----
    width_out = width
    gauss = jnp.asarray(fspecial_gauss(g.out, sigma), jnp.float32)
    scaled = jnp.where(preds >= NODATA, NODATA, preds * 100.0)
    row_idx0 = didx * g.rpd
    ones = jnp.ones_like(scaled)

    s_planes = _scatter_planes(scaled, oroffs, row_idx0, g, width_out)
    c_planes = _scatter_planes(ones, oroffs, row_idx0, g, width_out)
    stacked = _exchange_planes(
        jnp.concatenate([s_planes, c_planes], 0), g, didx)
    s_all = _combine(stacked[:4])
    c_all = _combine(stacked[4:])

    # per-window disagreement ratio vs the mean of the other windows
    # (reference load_mosaic_predictions :1503-1512,1598-1606)
    def row_ratios(args):
        oroff, p_row = args
        s_row = lax.dynamic_slice(s_all, (oroff, 0),
                                  (g.out, width_out))
        c_row = lax.dynamic_slice(c_all, (oroff, 0),
                                  (g.out, width_out))
        out = []
        for c in range(n_cols):
            s_rect = lax.dynamic_slice(s_row, (0, g.xs[c]),
                                       (g.out, g.out))
            c_rect = lax.dynamic_slice(c_row, (0, g.xs[c]),
                                       (g.out, g.out))
            p_i = p_row[c]
            others = c_rect - 1.0
            om = jnp.where(others > 0,
                           (s_rect - p_i) / jnp.maximum(others, 1.0),
                           0.0)
            ok = (others > 0).astype(jnp.float32)
            diff = jnp.abs(om - p_i) * ok
            out.append(jnp.sum(diff)
                       / jnp.maximum(jnp.sum(ok), 1.0))
        return jnp.stack(out)

    ratios = lax.map(row_ratios, (oroffs, scaled))   # (rpd, n_cols)
    all_ratios = lax.all_gather(ratios, AXIS)        # (ndev, rpd, n_cols)
    med = jnp.median(all_ratios.reshape(-1))
    mult = jnp.minimum(med / jnp.maximum(ratios, 1e-8), 1.5)

    valid = (scaled <= 100.0).astype(jnp.float32)
    w = gauss[None, None] * valid * mult[..., None, None]
    num = jnp.where(valid > 0, scaled, 0.0) * w
    n_planes = _scatter_planes(num, oroffs, row_idx0, g, width_out)
    d_planes = _scatter_planes(w, oroffs, row_idx0, g, width_out)
    v_planes = _scatter_planes(valid, oroffs, row_idx0, g, width_out)
    stacked = jnp.concatenate([n_planes, d_planes, v_planes], 0)
    stacked = _exchange_planes(stacked, g, didx)
    num_all = _combine(stacked[:4])
    den_all = _combine(stacked[4:8])
    vcnt = _combine(stacked[8:])

    blended = num_all / jnp.maximum(den_all, 1e-8)
    out_v = jnp.where(vcnt > 0, blended, NODATA)
    out_v = jnp.where(out_v <= 15.0, 0.0, out_v)
    out_v = jnp.where(out_v > 100.0, NODATA, out_v)
    center = lax.slice_in_dim(out_v, g.out_lead, g.out_lead + g.hs,
                              axis=0)

    # 10-iteration nodata dilation with a 10-row neighbor halo
    # (reference :1636-1640); block-edge devices see zero rows, which
    # for a binary mask matches the single-array edge behavior
    mask = (center == NODATA).astype(jnp.float32)
    recv_prev = lax.ppermute(mask[-10:], AXIS, _fwd_perm(g.ndev))
    recv_next = lax.ppermute(mask[:10], AXIS, _bwd_perm(g.ndev))
    zeros10 = jnp.zeros_like(mask[:10])
    ext_mask = jnp.concatenate([
        jnp.where(didx == 0, zeros10, recv_prev), mask,
        jnp.where(didx == g.ndev - 1, zeros10, recv_next)], axis=0)
    dil = dilate(ext_mask, iterations=10, cross=False)[10:-10]
    center = jnp.where(dil > 0, NODATA, center)
    return center.astype(jnp.uint8)


class ShardedBlockPredictor:
    """Seam-free G x G block prediction sharded over a device mesh.

    Drop-in interface of `BlockPredictor` (row-major grid of
    SmoothedTile in, per-tile rasters out), but the block program runs
    SPMD over `ndev` chips with ICI halo exchange, so blocks far beyond
    single-chip memory (4x4 and up) stay seam-free.

        mesh-of-1  == mesh-of-n bit-identically (parity-plane mosaic)
        vs BlockPredictor: equal up to last-ulp quantization steps
    """

    def __init__(self, params, cfg: InferenceConfig | None = None,
                 model: TreeCoverNet | None = None, grid: int = 4,
                 devices=None):
        self.cfg = cfg or InferenceConfig()
        self.model = model or TreeCoverNet()
        self.params = params
        self.grid = grid
        self.block_cfg = block_config(self.cfg, grid)
        if devices is None:
            # largest device count the block geometry splits over
            # (results are bit-identical for every count, so this is
            # purely a memory/throughput choice)
            avail = jax.devices()
            for n in range(len(avail), 0, -1):
                try:
                    strip_geometry(self.block_cfg, n)
                except ValueError:
                    continue
                devices = avail[:n]
                break
        devices = list(devices)
        if not devices:
            raise ValueError(
                f"no device count in 1..{len(jax.devices())} divides "
                f"the {self.block_cfg.tile_px} px / "
                f"{self.block_cfg.n_rows}-window-row block geometry")
        self.geom = strip_geometry(self.block_cfg, len(devices))
        self.mesh = Mesh(np.array(devices), (AXIS,))
        width = self.block_cfg.tile_px

        body = functools.partial(predict_block_strip, model=self.model,
                                 g=self.geom, width=width,
                                 sigma=self.block_cfg.gauss_sigma)
        specs = (P(),                       # params (replicated)
                 P(None, AXIS),             # s2 (12, H, W, 14)
                 P(None, AXIS),             # s1
                 P(AXIS),                   # dem (H, W)
                 P(AXIS),                   # s2_median
                 P(AXIS),                   # s1_median
                 P(AXIS))                   # clear_count
        self._sharding = [NamedSharding(self.mesh, s) for s in specs]
        self._fn = jax.jit(shard_map(body, self.mesh, specs, P(AXIS)))

    def predict_arrays(self, s2, s1, dem, s2_med, s1_med, clear):
        """Direct-array entry: stitched block inputs -> (H, W) raster."""
        args = [jax.device_put(jnp.asarray(a), s) for a, s in zip(
            (s2, s1, dem, s2_med, s1_med, clear), self._sharding[1:])]
        params = jax.device_put(self.params, self._sharding[0])
        return self._fn(params, *args)

    def __call__(self, sms_grid):
        gr = self.grid
        assert len(sms_grid) == gr and all(len(r) == gr
                                           for r in sms_grid), \
            f"expected a {gr}x{gr} row-major grid of SmoothedTiles"
        raster = self.predict_arrays(*stitch_tiles(sms_grid))
        return split_block_raster(raster, gr, self.cfg.tile_px)
