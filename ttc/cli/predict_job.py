"""Tree-cover prediction job: the main per-tile pipeline entry point.

CLI mirror of the reference's download_and_predict_job.py
(reference: src/download_and_predict_job.py:1653-2094): tile CSV
database, config.yaml credentials, idempotent per-tile loop with
exception backoff, raster + ARD artifact outputs, optional S3 upload.
Super-resolution of the 20 m bands is on by default like the reference
(:2001); tiles are georeferenced from the DB's X/Y point columns via
make_bbox (:154-171, 1925).

Usage:
    python -m ttc.cli.predict_job --country X --year 2023 \
        --db_path tiles.csv --local_path tiles/ [--backend fixture]
"""
from __future__ import annotations

import argparse
import logging
import os
import time

import numpy as np

from ttc.core.codecs import ndmi_to_int16
from ttc.core.config import InferenceConfig
from ttc.core.geo import make_bbox
from ttc.io.acquisition import FixtureBackend, RawTile
from ttc.io.arrays import save_array
from ttc.io.geotiff import write_tree_cover_tif
from ttc.io.store import TileStore
from ttc.ops.indices import ndmi
from ttc.preprocess.ard import process_tile, smooth_tile
from ttc.utils.profiling import StageTimer

log = logging.getLogger("ttc.predict_job")

# vmap width cap for the fused ARD+smooth program (the 24-step regrid
# stack lane-pads ~13x; B=2 is the measured HBM ceiling at 618 px) —
# the model forward is not affected and batches the full tile_batch
ARD_BATCH = 2

DEFAULT_WEIGHTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "weights", "treecover.npz")
DEFAULT_SR_WEIGHTS = os.path.join(
    os.path.dirname(DEFAULT_WEIGHTS), "superres.npz")


def load_tile_db(db_path: str, country: str | None = None):
    """Tile grid CSV with X_tile/Y_tile/X/Y (and country) columns
    (reference: :1768-1782)."""
    import pandas as pd

    df = pd.read_csv(db_path)
    if country and "country" in df.columns:
        df = df[df["country"] == country]
    return df.reset_index(drop=True)


def tile_bbox(row) -> list | None:
    """Expanded WGS84 bbox of a tile DB row: the X/Y point columns hold
    the tile centroid lon/lat; expansion 300 px of 1/360 deg
    (reference: download_and_predict_job.py:493-500, 1925)."""
    try:
        lon, lat = float(row["X"]), float(row["Y"])
    except (KeyError, TypeError, ValueError):
        return None
    if np.isnan(lon) or np.isnan(lat):
        return None
    return make_bbox([lon, lat, lon, lat], expansion=300 / 30)


def load_config_yaml(path: str) -> dict:
    """config.yaml with API keys / AWS credentials (reference:
    :1751-1766). Missing file -> empty config (offline mode)."""
    if not os.path.exists(path):
        return {}
    import yaml

    with open(path) as f:
        return yaml.safe_load(f) or {}


def build_model_params(model_path: str | None, rng_seed: int = 0,
                       allow_random_init: bool = False,
                       fp32: bool = False):
    """Load release weights (.npz) or an orbax checkpoint dir.

    An explicit but missing --model_path is an error; with no path at
    all, falls back to the bundled release weights, and only
    initializes random parameters when `allow_random_init` — the
    reference always restores a trained graph before predicting
    (reference: download_and_predict_job.py:1784-1826). Inference
    runs in bf16 by default (drift-gated, see
    ttc.models.unet.inference_model); fp32=True opts out."""
    import jax

    from ttc.models.unet import TreeCoverNet, inference_model

    model = inference_model(fp32)
    if model_path and not os.path.exists(model_path):
        raise FileNotFoundError(f"--model_path {model_path!r} does not "
                                "exist")
    if not model_path and os.path.exists(DEFAULT_WEIGHTS):
        model_path = DEFAULT_WEIGHTS
    if model_path:
        if model_path.endswith(".npz"):
            from ttc.train.checkpoint import load_params_npz

            return model, load_params_npz(model_path)
        from ttc.train.checkpoint import load_params

        # best-by-F1 selection, the reference's '{epoch}-{f1}' naming
        # intent (train-model.py:492-500); falls back to latest
        return model, load_params(model_path, step="best")
    if not allow_random_init:
        raise FileNotFoundError(
            "no trained weights: bundled release weights missing at "
            f"{DEFAULT_WEIGHTS} — pass --model_path, or "
            "--allow_random_init to emit untrained predictions")
    log.warning("RANDOM-INIT MODE: predictions come from untrained "
                "weights and are meaningless")
    params = jax.jit(model.init)(
        jax.random.PRNGKey(rng_seed),
        np.zeros((1, 5, 28, 28, 17), np.float32))
    return model, params


def load_sr_params(sr_path: str | None):
    if sr_path is None:
        sr_path = DEFAULT_SR_WEIGHTS if os.path.exists(
            DEFAULT_SR_WEIGHTS) else None
    if sr_path is None:
        return None
    from ttc.models.superres import params_from_npz

    return params_from_npz(sr_path)


def prepare_tile(x: int, y: int, year: int, backend, store: TileStore,
                 bbox=None, sr_params=None,
                 timer: StageTimer | None = None,
                 wire: str = "uint16"):
    """Host+device ARD stage: fetch -> process -> (SR) -> smooth.
    wire="compact" re-encodes the upload with ttc.io.wire."""
    timer = timer or StageTimer()
    store.make_tile_folders(x, y)
    with timer.stage("download"):
        raw: RawTile = backend.fetch(x, y, bbox, year)
    with timer.stage("ard"):
        from ttc.preprocess.ard import host_prepare

        prepped = host_prepare(raw, wire=wire)
        if sr_params is not None:
            tile = process_tile(prepped=prepped)
            import jax.numpy as jnp

            from ttc.models.superres import superresolve_tile

            # stays on device — smooth_tile consumes it there
            tile.s2 = superresolve_tile(sr_params,
                                        jnp.asarray(tile.s2))
            sm = smooth_tile(tile)
        else:
            # no SR between masking and smoothing: run the fused
            # single-dispatch ARD+smooth program
            tile, sm = process_tile(prepped=prepped, smooth=True)
    return tile, sm


def finish_tile(x: int, y: int, year: int, tile, sm, store: TileStore,
                predictor, bbox=None, timer: StageTimer | None = None,
                ul_flag: bool = False, gen_feats: bool = False,
                save_reseg: bool = False, raster=None):
    """Device predict + artifact writes for a prepared tile. Pass
    `raster` to reuse a prediction computed elsewhere (the pipelined
    loop's tile-batched predictor)."""
    timer = timer or StageTimer()

    # change-detection artifacts: NDMI stack, dates, slope raster
    # (reference :1161-1164; slope zipped into {year}/change via
    # io.py:153-201). Quantize to int16 on device, download once.
    import jax.numpy as jnp

    nd = np.asarray(ndmi_to_int16(ndmi(jnp.asarray(tile.s2))))
    ard_dir = os.path.join(store.tile_dir(x, y))
    save_array(os.path.join(ard_dir, "ard_ndmi.h5"), nd)
    np.save(os.path.join(ard_dir, "ard_dates.npy"), tile.dates)
    np.save(os.path.join(ard_dir, "dem.npy"),
            (np.asarray(tile.dem) * 90.0).astype(np.float32))

    if save_reseg:
        from ttc.infer.reseg import save_border_strips

        save_border_strips(store, x, y, sm)

    if raster is None:
        with timer.stage("predict"):
            raster = np.asarray(predictor(
                sm.s2, sm.s1, sm.dem, sm.s2_median, sm.s1_median,
                sm.clear_count))

    if gen_feats:
        import jax.numpy as jnp

        from ttc.core.bands import NORM_MAX, NORM_MIN
        from ttc.infer.mosaic import extract_tile_features
        from ttc.infer.pipeline import quarterly_medians
        from ttc.infer.windows import build_model_inputs, normalize

        with timer.stage("features"):
            batch, _ = build_model_inputs(
                quarterly_medians(jnp.asarray(sm.s2)),
                quarterly_medians(jnp.asarray(sm.s1)),
                jnp.asarray(sm.s2_median), jnp.asarray(sm.s1_median),
                jnp.asarray(sm.dem), predictor.cfg)
            norm = normalize(batch, NORM_MIN, NORM_MAX)
            early, late, _ = extract_tile_features(
                predictor.params, norm, predictor.model, predictor.cfg)
            feats_dir = os.path.join(store.tile_dir(x, y), "feats")
            os.makedirs(feats_dir, exist_ok=True)
            np.save(os.path.join(feats_dir, "early.npy"),
                    np.asarray(early))
            np.save(os.path.join(feats_dir, "late.npy"),
                    np.asarray(late))

    with timer.stage("write"):
        tif_path = store.final_tif_path(x, y)
        if bbox is None:
            log.warning("tile %s/%s has no DB lon/lat — writing "
                        "placeholder georeference", x, y)
            bbox = (0.0, 0.0, raster.shape[1] / 36000.0,
                    raster.shape[0] / 36000.0)
        write_tree_cover_tif(tif_path, raster, bbox)
        if ul_flag:
            key = store.s3_key(year, "tiles", x, y,
                               os.path.basename(tif_path))
            store.upload(tif_path, key)
    return raster


def run_tile(x: int, y: int, year: int, backend, store: TileStore,
             predictor, bbox=None, timer: StageTimer | None = None,
             ul_flag: bool = False, sr_params=None,
             gen_feats: bool = False, save_reseg: bool = False):
    """Full per-tile flow: fetch -> ARD -> smooth -> predict -> write."""
    timer = timer or StageTimer()
    tile, sm = prepare_tile(x, y, year, backend, store, bbox=bbox,
                            sr_params=sr_params, timer=timer)
    return finish_tile(x, y, year, tile, sm, store, predictor,
                       bbox=bbox, timer=timer, ul_flag=ul_flag,
                       gen_feats=gen_feats, save_reseg=save_reseg)


def run_tiles_pipelined(tiles, year, backend, store: TileStore,
                        predictor, timer: StageTimer | None = None,
                        ul_flag: bool = False, sr_params=None,
                        gen_feats: bool = False, save_reseg: bool = False,
                        prefetch_depth: int = 2, wire: str = "compact"):
    """Throughput mode: fetch + host prep of upcoming tiles runs in
    background threads while the device works on the current group —
    the replacement for the reference's strictly serial per-tile loop
    (BASELINE config 5 host-overlap requirement). Per-tile failures are
    contained with the same backoff as the serial loop.

    With tile_batch > 1, the whole device pipeline batches: groups of
    N tiles run masking/gap-fill/SR/Whittaker as vmapped fused ARD
    dispatches (ttc.preprocess.ard.process_and_smooth_tiles) and the
    forward as one tile-batched model call — amortizing dispatch
    latency across the group end to end. Uploads default to the
    compact wire codec (ttc.io.wire, ~28 MB/tile instead of 58;
    wire="uint16" restores the reference's raw format).

    `tiles` is a list of (x, y) or (x, y, bbox)."""
    import concurrent.futures as cf

    timer = timer or StageTimer("pipelined")
    norm_tiles = [t if len(t) == 3 else (t[0], t[1], None)
                  for t in tiles]
    tb = getattr(predictor, "tile_batch", 1)

    def _prepare(xyb):
        x, y, bbox = xyb
        if tb > 1:
            # host half only — the device ARD runs batched in
            # _finish_group. Upload the wire arrays here so the
            # host->device transfer of upcoming tiles overlaps with the
            # current group's device work (upload is the wall-time
            # floor on slow links).
            import jax

            from ttc.preprocess.ard import host_prepare

            store.make_tile_folders(x, y)
            with timer.stage("download"):
                raw = backend.fetch(x, y, bbox, year)
            with timer.stage("host_prep"):
                prep = host_prepare(raw, wire=wire)
                for k in ("s2_10", "s2_20", "s1", "dem", "s2_10_sc",
                          "s2_20_sc"):
                    if prep.get(k) is not None:
                        prep[k] = jax.device_put(prep[k])
            return x, y, bbox, prep, None
        tile, sm = prepare_tile(x, y, year, backend, store, bbox=bbox,
                                sr_params=sr_params, timer=timer,
                                wire=wire)
        return x, y, bbox, tile, sm

    def _finish_group(group):
        """Predict a group of prepared tiles in one device call
        (tile_batch program; short tails are padded by repeating the
        last tile and the extra outputs dropped), then write each."""
        rasters = [None] * len(group)
        if tb > 1:
            import jax.numpy as jnp

            from ttc.preprocess.ard import process_and_smooth_tiles

            with timer.stage("ard"):
                # ARD batches cap at 2 (HBM ceiling of the fused
                # smooth program at production geometry); the forward
                # below still batches the full tile_batch
                processed = process_and_smooth_tiles(
                    prepped_list=[g[3] for g in group],
                    sr_params=sr_params, pad_to=min(tb, ARD_BATCH),
                    max_batch=ARD_BATCH)
            group = [(x, y, bbox, tile, sm)
                     for (x, y, bbox, _, _), (tile, sm)
                     in zip(group, processed)]
            sms = [g[4] for g in group]
            pad = [sms[-1]] * (tb - len(sms))
            with timer.stage("predict"):
                stacked = [
                    jnp.stack([jnp.asarray(getattr(s, f))
                               for s in sms + pad])
                    for f in ("s2", "s1", "dem", "s2_median",
                              "s1_median", "clear_count")]
                out = np.asarray(predictor(*stacked))
            rasters = [out[i] for i in range(len(sms))]
        for (x, y, bbox, tile, sm), raster in zip(group, rasters):
            raster = finish_tile(
                x, y, year, tile, sm, store, predictor, bbox=bbox,
                timer=timer, ul_flag=ul_flag, gen_feats=gen_feats,
                save_reseg=save_reseg, raster=raster)
            results[(x, y)] = raster
            log.info("tile %s/%s complete (pipelined)", x, y)

    results = {}
    n_exceptions = 0
    group = []
    todo = []
    for xyb in norm_tiles:
        if store.tile_done(year, xyb[0], xyb[1]):
            log.info("tile %s/%s already done, skipping",
                     xyb[0], xyb[1])
            continue
        todo.append(xyb)

    def _bounded_futures(pool):
        """At most tile_batch + prefetch_depth prepares in flight:
        submitting every tile up front lets the prefetch threads run
        arbitrarily far ahead of the device and accumulate the whole
        run's wire payloads in host RAM (measured 14+ GB on a 64-tile
        stream)."""
        from collections import deque

        window = max(tb, 1) + prefetch_depth
        pending = deque()
        it = iter(todo)
        while True:
            while len(pending) < window:
                nxt = next(it, None)
                if nxt is None:
                    break
                pending.append((nxt, pool.submit(_prepare, nxt)))
            if not pending:
                return
            yield pending.popleft()

    with cf.ThreadPoolExecutor(max_workers=prefetch_depth) as pool:
        def _flush(members):
            """Run _finish_group, containing failures: a device-side
            group failure abandons every member (all unwritten, so each
            partial dir is cleaned) and the NEXT group starts empty —
            otherwise tiles would pile into one oversized tail group
            that can never match the compiled batch shape."""
            nonlocal n_exceptions
            try:
                _finish_group(members)
            except KeyboardInterrupt:
                raise
            except Exception:
                n_exceptions += 1
                log.exception("group of %d failed (%d failures)",
                              len(members), n_exceptions)
                for g in members:
                    store.cleanup_tile(g[0], g[1])
                time.sleep(10 + 5 * n_exceptions)

        for xyb, fut in _bounded_futures(pool):
            try:
                prepared = fut.result()
            except KeyboardInterrupt:
                raise
            except Exception:
                # a fetch/prep failure drops only THIS tile; tiles
                # already prepared stay queued for the next flush
                n_exceptions += 1
                log.exception("tile %s/%s failed (%d failures)",
                              xyb[0], xyb[1], n_exceptions)
                store.cleanup_tile(xyb[0], xyb[1])
                time.sleep(10 + 5 * n_exceptions)
                continue
            group.append(prepared)
            if len(group) >= max(tb, 1):
                _flush(group)
                group = []
        if group:
            _flush(group)
    timer.log_report()
    return results


def run_tiles_blocked(tiles, year, backend, store: TileStore,
                      predictor, timer: StageTimer | None = None,
                      ul_flag: bool = False, sr_params=None,
                      gen_feats: bool = False, save_reseg: bool = False,
                      grid: int = 2, prefetch_depth: int = 4,
                      sharded: bool = False):
    """Seam-free mode: tiles forming complete grid x grid blocks are
    predicted as ONE shared-halo super-tile (ttc.infer.block) — the
    windows straddle former tile boundaries and the mosaic blends
    across them, so no interior seams exist and resegmentation is only
    needed at block edges. Tiles without a complete block fall back to
    the per-tile path. Tile (x, y+1) is NORTH of (x, y) (core.geo
    tile_bbox_utm), i.e. block grid row 0.

    `sharded` runs each block SPMD over every visible chip
    (ttc.infer.block_sharded): the super-tile is split into horizontal
    strips with ICI halo exchange, so blocks beyond single-chip memory
    (4x4+) stay seam-free. Bit-identical for any chip count.

    `tiles` is a list of (x, y) or (x, y, bbox)."""
    import concurrent.futures as cf

    from ttc.infer.block import BlockPredictor

    timer = timer or StageTimer("blocked")
    norm = {(t[0], t[1]): (t[2] if len(t) == 3 else None)
            for t in tiles}
    pending = {xy for xy in norm
               if not store.tile_done(year, xy[0], xy[1])}
    blocks, singles = [], []
    for (x, y) in sorted(pending, key=lambda p: (-p[1], p[0])):
        coords = [[(x + j, y + grid - 1 - i) for j in range(grid)]
                  for i in range(grid)]
        flat = [c for row in coords for c in row]
        if all(c in pending for c in flat):
            blocks.append(coords)
            pending -= set(flat)
    singles = sorted(pending)

    if sharded:
        from ttc.infer.block_sharded import ShardedBlockPredictor

        bp = ShardedBlockPredictor(predictor.params, predictor.cfg,
                                   predictor.model, grid=grid)
    else:
        bp = BlockPredictor(predictor.params, predictor.cfg,
                            predictor.model, grid=grid)
    results = {}
    n_exceptions = 0
    with cf.ThreadPoolExecutor(max_workers=prefetch_depth) as pool:
        for coords in blocks:
            flat = [c for row in coords for c in row]
            try:
                futs = {c: pool.submit(
                    prepare_tile, c[0], c[1], year, backend, store,
                    bbox=norm[c], sr_params=sr_params, timer=timer)
                    for c in flat}
                prepped = {c: f.result() for c, f in futs.items()}
                with timer.stage("predict"):
                    rasters = bp([[prepped[c][1] for c in row]
                                  for row in coords])
                for i, row in enumerate(coords):
                    for j, c in enumerate(row):
                        tile, sm = prepped[c]
                        results[c] = finish_tile(
                            c[0], c[1], year, tile, sm, store,
                            predictor, bbox=norm[c], timer=timer,
                            ul_flag=ul_flag, gen_feats=gen_feats,
                            save_reseg=save_reseg,
                            raster=np.asarray(rasters[i][j]))
                        log.info("tile %s/%s complete (block)", *c)
            except KeyboardInterrupt:
                raise
            except Exception:
                n_exceptions += 1
                log.exception("block %s failed (%d failures)", flat,
                              n_exceptions)
                for c in flat:
                    store.cleanup_tile(*c)
                time.sleep(10 + 5 * n_exceptions)
    for (x, y) in singles:
        try:
            results[(x, y)] = run_tile(
                x, y, year, backend, store, predictor,
                bbox=norm[(x, y)], timer=timer, ul_flag=ul_flag,
                sr_params=sr_params, gen_feats=gen_feats,
                save_reseg=save_reseg)
            log.info("tile %s/%s complete (single)", x, y)
        except KeyboardInterrupt:
            raise
        except Exception:
            n_exceptions += 1
            log.exception("tile %s/%s failed (%d failures)", x, y,
                          n_exceptions)
            store.cleanup_tile(x, y)
            time.sleep(10 + 5 * n_exceptions)
    timer.log_report()
    return results


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--country", default="")
    parser.add_argument("--year", type=int, default=2023)
    parser.add_argument("--local_path", default="tiles/")
    parser.add_argument("--db_path", default=None)
    parser.add_argument("--yaml_path", default="config.yaml")
    parser.add_argument("--model_path", default=None)
    parser.add_argument("--allow_random_init", action="store_true",
                        help="permit running without trained weights "
                             "(predictions are meaningless)")
    parser.add_argument("--fp32", action="store_true",
                        help="disable the default bf16 inference "
                             "(drift-gated; see unet.inference_model)")
    parser.add_argument("--sr_path", default=None,
                        help="super-resolution weights (.npz); "
                             "defaults to the bundled release weights")
    parser.add_argument("--no_superres", action="store_true",
                        help="disable 20 m band super-resolution")
    parser.add_argument("--s3_bucket", default=None)
    parser.add_argument("--ul_flag", action="store_true")
    parser.add_argument("--gen_feats", action="store_true")
    parser.add_argument("--save_reseg", action="store_true",
                        help="persist smoothed border strips for "
                             "re-download-free seam repair")
    parser.add_argument("--pipelined", action="store_true",
                        help="overlap host ARD of upcoming tiles with "
                             "device prediction")
    parser.add_argument("--tile_batch", type=int, default=4,
                        help="pipelined mode: predict N tiles per "
                             "device call (windows of all N tiles run "
                             "as one model batch; ~2x forward "
                             "throughput at the measured knee of 4, "
                             "the default). Tiles must share geometry")
    parser.add_argument("--block", type=int, default=0, metavar="G",
                        help="seam-free mode: predict complete GxG "
                             "groups of adjacent tiles as one "
                             "shared-halo super-tile (no interior "
                             "seams; reseg only needed at block "
                             "edges). Leftover tiles run per-tile")
    parser.add_argument("--wire", default="compact",
                        choices=["compact", "uint16"],
                        help="pipelined host->device payload codec: "
                             "compact (int8 reference+residual planes, "
                             "~28 MB/tile, drift-gated) or the "
                             "reference's raw uint16 (58 MB/tile)")
    parser.add_argument("--block_sharded", action="store_true",
                        help="with --block: run each super-tile SPMD "
                             "over all visible chips (strip sharding "
                             "+ ICI halo exchange) so 4x4+ blocks fit "
                             "beyond single-chip memory")
    parser.add_argument("--redownload", action="store_true")
    parser.add_argument("--reprocess", action="store_true")
    parser.add_argument("--start", type=int, default=0)
    parser.add_argument("--end", type=int, default=None)
    parser.add_argument("--x", type=int, default=None)
    parser.add_argument("--y", type=int, default=None)
    parser.add_argument("--length", type=int, default=4)
    parser.add_argument("--tile_px", type=int, default=None,
                        help="override tile geometry (default 618)")
    parser.add_argument("--out_size", type=int, default=None)
    parser.add_argument("--n_rows", type=int, default=None)
    parser.add_argument("--backend", default="fixture",
                        choices=["fixture", "forest", "sentinelhub"])
    args = parser.parse_args(argv)

    # fleet workers / CI set TTC_PLATFORM=cpu to run off the TPU (the
    # environment's sitecustomize pins JAX_PLATFORMS, so plain env
    # vars don't stick — jax.config before backend init does)
    plat = os.environ.get("TTC_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)

    from ttc.utils.logging import setup_logging
    setup_logging()
    from ttc.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    cfg_yaml = load_config_yaml(args.yaml_path)

    store = TileStore(args.local_path, bucket=args.s3_bucket)
    fixture_hw = args.tile_px or InferenceConfig().tile_px
    if args.backend == "sentinelhub":
        from ttc.io.acquisition import SentinelHubBackend

        backend = SentinelHubBackend(
            instance_id=cfg_yaml.get("key", ""),
            client_id=cfg_yaml.get("client_id", ""),
            client_secret=cfg_yaml.get("client_secret", ""))
    elif args.backend == "forest":
        from ttc.io.forest import ForestFixtureBackend

        backend = ForestFixtureBackend(hw=fixture_hw)
    else:
        backend = FixtureBackend(hw=fixture_hw)

    model, params = build_model_params(
        args.model_path, allow_random_init=args.allow_random_init,
        fp32=args.fp32)
    sr_params = None if args.no_superres else load_sr_params(
        args.sr_path)
    if sr_params is None and not args.no_superres:
        log.warning("superres weights not found — SR disabled")

    from ttc.infer.pipeline import TilePredictor

    cfg_kwargs = {k: getattr(args, k) for k in
                  ("tile_px", "out_size", "n_rows")
                  if getattr(args, k) is not None}
    predictor = TilePredictor(params, InferenceConfig(**cfg_kwargs),
                              model,
                              tile_batch=(args.tile_batch
                                          if args.pipelined else 1))

    # (x, y, bbox) triples; bbox from the DB's X/Y centroid columns
    if args.db_path:
        df = load_tile_db(args.db_path, args.country)
        if args.x is not None and args.y is not None:
            df = df[(df["X_tile"].astype(int) == args.x)
                    & (df["Y_tile"].astype(int) == args.y)]
        else:
            df = df.iloc[args.start:args.end]
        tiles = [(int(r["X_tile"]), int(r["Y_tile"]), tile_bbox(r))
                 for _, r in df.iterrows()]
    elif args.x is not None and args.y is not None:
        tiles = [(args.x, args.y, None)]
    else:
        parser.error("provide --db_path or --x/--y")

    if args.backend == "sentinelhub":
        missing = [(x, y) for x, y, b in tiles if b is None]
        if missing:
            parser.error(f"tiles {missing} have no lon/lat in the DB — "
                         "cannot acquire live imagery without a bbox")

    timer = StageTimer("predict_job")
    if args.block and args.block > 1:
        run_tiles_blocked(tiles, args.year, backend, store, predictor,
                          timer=timer, ul_flag=args.ul_flag,
                          sr_params=sr_params,
                          gen_feats=args.gen_feats,
                          save_reseg=args.save_reseg, grid=args.block,
                          sharded=args.block_sharded)
        return

    if args.pipelined:
        run_tiles_pipelined(tiles, args.year, backend, store, predictor,
                            timer=timer, ul_flag=args.ul_flag,
                            sr_params=sr_params,
                            gen_feats=args.gen_feats,
                            save_reseg=args.save_reseg, wire=args.wire)
        return

    n_exceptions = 0
    for x, y, bbox in tiles:
        if store.tile_done(args.year, x, y):
            log.info("tile %s/%s already done, skipping", x, y)
            continue
        try:
            run_tile(x, y, args.year, backend, store, predictor,
                     bbox=bbox, timer=timer, ul_flag=args.ul_flag,
                     sr_params=sr_params, gen_feats=args.gen_feats,
                     save_reseg=args.save_reseg)
            log.info("tile %s/%s complete", x, y)
        except KeyboardInterrupt:
            raise
        except Exception:
            # per-tile containment with linear backoff
            # (reference :2079-2091)
            n_exceptions += 1
            log.exception("tile %s/%s failed (%d failures)", x, y,
                          n_exceptions)
            store.cleanup_tile(x, y)
            time.sleep(10 + 5 * n_exceptions)
    timer.log_report()


if __name__ == "__main__":
    main()
