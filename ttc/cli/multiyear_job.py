"""Multi-year prediction job: one tile across a span of years.

Counterpart of the reference's download_and_predict_job_multiyear.py
(reference: src/download_and_predict_job_multiyear.py:1-1136): shares
the DEM and model across years, runs the per-year predict pipeline, and
lays outputs out as {local_path}/{year}/{x}/{y}/ so the change job can
consume them directly.

Usage:
    python -m ttc.cli.multiyear_job --x 10 --y 12 \
        --start_year 2017 --end_year 2024 [--backend fixture]
"""
from __future__ import annotations

import argparse
import logging
import os

from ttc.cli.predict_job import build_model_params, run_tile
from ttc.core.config import InferenceConfig
from ttc.infer.pipeline import TilePredictor
from ttc.io.acquisition import FixtureBackend
from ttc.io.store import TileStore
from ttc.utils.profiling import StageTimer

log = logging.getLogger("ttc.multiyear_job")


def run_multiyear(x: int, y: int, start_year: int, end_year: int,
                  local_path: str, backend=None, predictor=None,
                  model_path: str | None = None, ul_flag: bool = False):
    backend = backend or FixtureBackend()
    if predictor is None:
        model, params = build_model_params(model_path)
        predictor = TilePredictor(params, InferenceConfig(), model)

    timer = StageTimer("multiyear")
    rasters = {}
    for year in range(start_year, end_year + 1):
        store = TileStore(os.path.join(local_path, str(year)))
        if store.tile_done(year, x, y):
            log.info("year %d tile %s/%s done, skipping", year, x, y)
            continue
        rasters[year] = run_tile(x, y, year, backend, store, predictor,
                                 timer=timer, ul_flag=ul_flag)
        log.info("year %d tile %s/%s complete", year, x, y)
    timer.log_report()
    return rasters


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--x", type=int, required=True)
    parser.add_argument("--y", type=int, required=True)
    parser.add_argument("--start_year", type=int, default=2017)
    parser.add_argument("--end_year", type=int, default=2024)
    parser.add_argument("--local_path", default="tiles/")
    parser.add_argument("--model_path", default=None)
    parser.add_argument("--ul_flag", action="store_true")
    parser.add_argument("--backend", default="fixture")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    run_multiyear(args.x, args.y, args.start_year, args.end_year,
                  args.local_path, model_path=args.model_path,
                  ul_flag=args.ul_flag)


if __name__ == "__main__":
    main()
