"""Tree-cover prediction job: the main per-tile pipeline entry point.

CLI mirror of the reference's download_and_predict_job.py
(reference: src/download_and_predict_job.py:1653-2094): tile CSV
database, config.yaml credentials, idempotent per-tile loop with
exception backoff, raster + ARD artifact outputs, optional S3 upload.

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
from ttc.io.acquisition import FixtureBackend, RawTile
from ttc.io.arrays import save_array
from ttc.io.geotiff import write_tree_cover_tif
from ttc.io.store import TileStore
from ttc.ops.indices import ndmi
from ttc.preprocess.ard import process_tile, smooth_tile
from ttc.utils.profiling import StageTimer

log = logging.getLogger("ttc.predict_job")


def load_tile_db(db_path: str, country: str | None = None):
    """Tile grid CSV with X_tile/Y_tile/X/Y (and country) columns
    (reference: :1768-1782)."""
    import pandas as pd

    df = pd.read_csv(db_path)
    if country and "country" in df.columns:
        df = df[df["country"] == country]
    return df.reset_index(drop=True)


def load_config_yaml(path: str) -> dict:
    """config.yaml with API keys / AWS credentials (reference:
    :1751-1766). Missing file -> empty config (offline mode)."""
    if not os.path.exists(path):
        return {}
    import yaml

    with open(path) as f:
        return yaml.safe_load(f) or {}


def build_model_params(model_path: str | None, rng_seed: int = 0):
    """Load checkpointed params (orbax) or initialize fresh."""
    import jax

    from ttc.models.unet import TreeCoverNet

    model = TreeCoverNet()
    if model_path and os.path.exists(model_path):
        from ttc.train.checkpoint import load_params

        return model, load_params(model_path)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(rng_seed),
        np.zeros((1, 5, 28, 28, 17), np.float32))
    return model, params


def run_tile(x: int, y: int, year: int, backend, store: TileStore,
             predictor, bbox=None, timer: StageTimer | None = None,
             ul_flag: bool = False, sr_params=None,
             gen_feats: bool = False, save_reseg: bool = False):
    """Full per-tile flow: fetch -> ARD -> smooth -> predict -> write."""
    timer = timer or StageTimer()
    store.make_tile_folders(x, y)

    with timer.stage("download"):
        raw: RawTile = backend.fetch(x, y, bbox, year)

    with timer.stage("ard"):
        tile = process_tile(raw)
        if sr_params is not None:
            import jax.numpy as jnp

            from ttc.models.superres import superresolve_tile

            tile.s2 = np.asarray(
                superresolve_tile(sr_params, jnp.asarray(tile.s2)))
        sm = smooth_tile(tile)

    # change-detection artifacts (reference :1161-1164)
    nd = ndmi_to_int16(np.asarray(ndmi(tile.s2)))
    ard_dir = os.path.join(store.tile_dir(x, y))
    save_array(os.path.join(ard_dir, "ard_ndmi.h5"), nd)
    np.save(os.path.join(ard_dir, "ard_dates.npy"), tile.dates)

    if save_reseg:
        from ttc.infer.reseg import save_border_strips

        save_border_strips(store, x, y, sm)

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
            bbox = (0.0, 0.0, raster.shape[1] / 36000.0,
                    raster.shape[0] / 36000.0)
        write_tree_cover_tif(tif_path, raster, bbox)
        if ul_flag:
            key = store.s3_key(year, "tiles", x, y,
                               os.path.basename(tif_path))
            store.upload(tif_path, key)
    return raster


def run_tiles_pipelined(tiles, year, backend, store: TileStore,
                        predictor, timer: StageTimer | None = None,
                        ul_flag: bool = False, prefetch_depth: int = 2):
    """Throughput mode: fetch + ARD of upcoming tiles runs in a
    background thread while the device predicts the current one —
    the replacement for the reference's strictly serial per-tile loop
    (BASELINE config 5 host-overlap requirement)."""
    import concurrent.futures as cf

    timer = timer or StageTimer("pipelined")

    def _prepare(xy):
        x, y = xy
        store.make_tile_folders(x, y)
        raw = backend.fetch(x, y, None, year)
        tile = process_tile(raw)
        sm = smooth_tile(tile)
        return x, y, tile, sm

    results = {}
    with cf.ThreadPoolExecutor(max_workers=prefetch_depth) as pool:
        futures = [pool.submit(_prepare, xy) for xy in tiles]
        for fut in futures:
            x, y, tile, sm = fut.result()
            with timer.stage("predict"):
                raster = np.asarray(predictor(
                    sm.s2, sm.s1, sm.dem, sm.s2_median, sm.s1_median,
                    sm.clear_count))
            nd = ndmi_to_int16(np.asarray(ndmi(tile.s2)))
            save_array(os.path.join(store.tile_dir(x, y),
                                    "ard_ndmi.h5"), nd)
            np.save(os.path.join(store.tile_dir(x, y),
                                 "ard_dates.npy"), tile.dates)
            tif = store.final_tif_path(x, y)
            write_tree_cover_tif(
                tif, raster,
                (0.0, 0.0, raster.shape[1] / 36000.0,
                 raster.shape[0] / 36000.0))
            if ul_flag:
                store.upload(tif, store.s3_key(
                    year, "tiles", x, y, os.path.basename(tif)))
            results[(x, y)] = raster
            log.info("tile %s/%s complete (pipelined)", x, y)
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
    parser.add_argument("--s3_bucket", default=None)
    parser.add_argument("--ul_flag", action="store_true")
    parser.add_argument("--gen_feats", action="store_true")
    parser.add_argument("--save_reseg", action="store_true",
                        help="persist smoothed border strips for "
                             "re-download-free seam repair")
    parser.add_argument("--redownload", action="store_true")
    parser.add_argument("--reprocess", action="store_true")
    parser.add_argument("--start", type=int, default=0)
    parser.add_argument("--end", type=int, default=None)
    parser.add_argument("--x", type=int, default=None)
    parser.add_argument("--y", type=int, default=None)
    parser.add_argument("--length", type=int, default=4)
    parser.add_argument("--backend", default="fixture",
                        choices=["fixture", "sentinelhub"])
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    cfg_yaml = load_config_yaml(args.yaml_path)

    store = TileStore(args.local_path, bucket=args.s3_bucket)
    if args.backend == "sentinelhub":
        from ttc.io.acquisition import SentinelHubBackend

        backend = SentinelHubBackend(
            instance_id=cfg_yaml.get("key", ""),
            client_id=cfg_yaml.get("client_id", ""),
            client_secret=cfg_yaml.get("client_secret", ""))
    else:
        backend = FixtureBackend()

    model, params = build_model_params(args.model_path)

    from ttc.infer.pipeline import TilePredictor

    predictor = TilePredictor(params, InferenceConfig(), model)

    if args.x is not None and args.y is not None:
        tiles = [(args.x, args.y)]
    elif args.db_path:
        df = load_tile_db(args.db_path, args.country)
        sl = df.iloc[args.start:args.end]
        tiles = list(zip(sl["X_tile"].astype(int),
                         sl["Y_tile"].astype(int)))
    else:
        parser.error("provide --db_path or --x/--y")

    timer = StageTimer("predict_job")
    n_exceptions = 0
    for x, y in tiles:
        if store.tile_done(args.year, x, y):
            log.info("tile %s/%s already done, skipping", x, y)
            continue
        try:
            run_tile(x, y, args.year, backend, store, predictor,
                     timer=timer, ul_flag=args.ul_flag,
                     gen_feats=args.gen_feats,
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
