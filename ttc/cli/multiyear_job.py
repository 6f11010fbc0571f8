"""Multi-year prediction job: one tile across a span of years.

Counterpart of the reference's download_and_predict_job_multiyear.py.
The reference's multiyear design (reference:
src/download_and_predict_job_multiyear.py:188-330, 1060-1136):

- the S2/cloud archive is acquired ONCE spanning all years
  (`dates = ('2017-01-01', '2020-12-31')`, :1075) and thinned to ~one
  clean image per month by cloud cover with day-of-year semantics
  (`dates % 365`, cloud_removal.print_dates :1796-1860) — so years
  with sparse clean imagery are backfilled from neighboring years;
- DEM is downloaded once per tile and shared (:325-328);
- S1 is fetched for the target year (:1076) and reused when a year
  has none.

Here each year's raw stack is fetched once and cached, the DEM is
shared, empty S1 borrows the nearest year, and per-year stacks below
`min_dates` clean images are backfilled month-by-month from the
nearest years (preferring the target year per month, least-cloudy
image otherwise). The predictor and its compiled program are shared
across all years. Outputs are laid out as {local_path}/{year}/{x}/{y}/
so the change job consumes them directly.

Usage:
    python -m ttc.cli.multiyear_job --x 10 --y 12 \
        --start_year 2017 --end_year 2024 [--backend fixture]
"""
from __future__ import annotations

import argparse
import copy
import logging
import os

import numpy as np

from ttc.cli.predict_job import (build_model_params, finish_tile,
                                 load_sr_params)
from ttc.core.config import InferenceConfig
from ttc.infer.pipeline import TilePredictor
from ttc.io.acquisition import FixtureBackend, RawTile
from ttc.io.store import TileStore
from ttc.preprocess.ard import process_tile, smooth_tile
from ttc.utils.profiling import StageTimer

log = logging.getLogger("ttc.multiyear_job")


class _SharedRawBackend:
    """Acquisition wrapper for one tile across years: fetches each
    year once, shares the DEM raster, borrows S1 from the nearest
    year when a year's own is empty."""

    def __init__(self, backend, years):
        self.backend = backend
        self.years = list(years)
        self._cache: dict[int, RawTile] = {}
        self._dem = None

    def fetch(self, x, y, bbox, year) -> RawTile:
        if year not in self._cache:
            raw = self.backend.fetch(x, y, bbox, year)
            if self._dem is None and raw.dem is not None \
                    and np.any(np.isfinite(raw.dem)):
                self._dem = raw.dem
            self._cache[year] = raw
        raw = self._cache[year]
        if self._dem is not None:
            raw.dem = self._dem  # one shared DEM (ref :325-328)
        if not _has_s1(raw):
            donor = self._nearest_with_s1(x, y, bbox, year)
            if donor is not None:
                raw.s1 = donor.s1
                raw.s1_dates = donor.s1_dates
                log.info("year %d: empty S1, borrowed from nearest "
                         "year", year)
        return raw

    def _nearest_with_s1(self, x, y, bbox, year):
        for other in sorted(self.years, key=lambda yy: abs(yy - year)):
            if other == year:
                continue
            if other not in self._cache:
                try:
                    self.fetch(x, y, bbox, other)
                except Exception:
                    continue
            if _has_s1(self._cache[other]):
                return self._cache[other]
        return None


def _has_s1(raw: RawTile) -> bool:
    s1 = raw.s1
    return s1 is not None and s1.size > 0 \
        and bool(np.any(np.isfinite(s1) & (s1 != 0)))


def _date_cloudiness(raw: RawTile) -> np.ndarray:
    """Mean preview cloud probability per date."""
    if raw.clouds is None or raw.clouds.size == 0:
        return np.zeros(len(raw.s2_dates), np.float32)
    return np.nanmean(raw.clouds, axis=(1, 2)).astype(np.float32)


def backfill_year(raws: dict[int, RawTile], year: int,
                  min_dates: int = 8,
                  max_dates: int = 16) -> RawTile:
    """Cross-year monthly backfill for a sparse year.

    When `year` has >= min_dates images it is returned as-is. Below
    that, months with no target-year image are filled from the
    nearest year that has one (least-cloudy image in that month),
    using day-of-year semantics — the distilled behavior of the
    reference's multi-year archive + print_dates monthly thinning
    (reference: download_and_predict_job_multiyear.py:242-284,
    cloud_removal.py:1796-1860).
    """
    base = raws[year]
    if len(base.s2_dates) >= min_dates:
        return base

    month_edges = np.cumsum([0, 31, 28, 31, 30, 31, 30, 31, 31, 30,
                             31, 30, 31])
    have_months = set(np.searchsorted(month_edges,
                                      np.asarray(base.s2_dates) % 365,
                                      side="right") - 1)

    add_s2_10, add_s2_20, add_dates, add_clouds = [], [], [], []
    add_cloudiness = []
    for month in range(12):
        if month in have_months:
            continue
        lo, hi = month_edges[month], month_edges[month + 1]
        for other in sorted(raws, key=lambda yy: abs(yy - year)):
            if other == year:
                continue
            r = raws[other]
            doy = np.asarray(r.s2_dates) % 365
            idx = np.where((doy >= lo) & (doy < hi))[0]
            if idx.size == 0:
                continue
            cloud = _date_cloudiness(r)[idx]
            pick = int(idx[np.argmin(cloud)])
            add_s2_10.append(r.s2_10[pick])
            add_s2_20.append(r.s2_20[pick])
            add_dates.append(int(doy[pick]))
            add_cloudiness.append(float(cloud.min()))
            add_clouds.append(r.clouds[pick]
                              if r.clouds is not None else None)
            break

    if not add_dates:
        return base
    # Over-budget: drop the CLOUDIEST backfilled dates (never the target
    # year's own), not the chronological tail — tail truncation would
    # silently drop Oct-Dec and seasonally bias the monthly ARD. The
    # reference thins per-month by cloud cover (cloud_removal.py:
    # 1796-1860).
    n_over = len(base.s2_dates) + len(add_dates) - max_dates
    if n_over > 0:
        keep_add = np.argsort(np.asarray(add_cloudiness),
                              kind="stable")[:len(add_dates) - n_over]
        keep_add = np.sort(keep_add)
        dropped = sorted(int(add_dates[i]) for i in range(len(add_dates))
                         if i not in set(keep_add.tolist()))
        log.info("year %d: over max_dates=%d, dropped %d cloudiest "
                 "backfilled dates (doy %s)", year, max_dates,
                 n_over, dropped)
        add_s2_10 = [add_s2_10[i] for i in keep_add]
        add_s2_20 = [add_s2_20[i] for i in keep_add]
        add_clouds = [add_clouds[i] for i in keep_add]
        add_dates = [add_dates[i] for i in keep_add]
    out = copy.copy(base)
    dates = np.concatenate([np.asarray(base.s2_dates) % 365,
                            np.asarray(add_dates)])
    order = np.argsort(dates, kind="stable")
    out.s2_dates = dates[order]
    out.s2_10 = np.concatenate(
        [base.s2_10, np.stack(add_s2_10)])[order]
    out.s2_20 = np.concatenate(
        [base.s2_20, np.stack(add_s2_20)])[order]
    if base.clouds is not None and all(c is not None
                                       for c in add_clouds):
        out.clouds = np.concatenate(
            [base.clouds, np.stack(add_clouds)])[order]
    log.info("year %d: backfilled %d months from neighboring years "
             "(%d -> %d dates)", year, len(add_dates),
             len(base.s2_dates), len(out.s2_dates))
    return out


def run_multiyear(x: int, y: int, start_year: int, end_year: int,
                  local_path: str, backend=None, predictor=None,
                  model_path: str | None = None, ul_flag: bool = False,
                  bbox=None, sr_params=None, min_dates: int = 8,
                  save_reseg: bool = False):
    backend = backend or FixtureBackend(hw=InferenceConfig().tile_px)
    if predictor is None:
        model, params = build_model_params(model_path)
        predictor = TilePredictor(params, InferenceConfig(), model)

    years = list(range(start_year, end_year + 1))
    shared = _SharedRawBackend(backend, years)
    timer = StageTimer("multiyear")
    rasters = {}
    stores = {year: TileStore(os.path.join(local_path, str(year)))
              for year in years}
    pending = [year for year in years
               if not stores[year].tile_done(year, x, y)]
    for year in set(years) - set(pending):
        log.info("year %d tile %s/%s done, skipping", year, x, y)
    # acquire the full span up front (the reference downloads the
    # whole 2017-2020 archive in one pass, :1075) so every year can
    # backfill from every other
    with timer.stage("download"):
        for year in pending:
            shared.fetch(x, y, bbox, year)
    for year in pending:
        store = stores[year]
        try:
            raw = backfill_year(shared._cache, year,
                                min_dates=min_dates)
            store.make_tile_folders(x, y)
            with timer.stage("ard"):
                tile = process_tile(raw)
                if sr_params is not None:
                    import jax.numpy as jnp

                    from ttc.models.superres import superresolve_tile

                    tile.s2 = superresolve_tile(
                        sr_params, jnp.asarray(tile.s2))
                sm = smooth_tile(tile)
            rasters[year] = finish_tile(
                x, y, year, tile, sm, store, predictor, bbox=bbox,
                timer=timer, ul_flag=ul_flag, save_reseg=save_reseg)
            log.info("year %d tile %s/%s complete", year, x, y)
        except KeyboardInterrupt:
            raise
        except Exception:
            log.exception("year %d tile %s/%s failed", year, x, y)
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
    parser.add_argument("--min_dates", type=int, default=8,
                        help="backfill a year from its neighbors "
                             "below this many clean images")
    parser.add_argument("--no_superres", action="store_true")
    parser.add_argument("--save_reseg", action="store_true")
    parser.add_argument("--ul_flag", action="store_true")
    parser.add_argument("--backend", default="fixture",
                        choices=["fixture", "forest"])
    parser.add_argument("--tile_px", type=int, default=None)
    parser.add_argument("--out_size", type=int, default=None)
    parser.add_argument("--n_rows", type=int, default=None)
    parser.add_argument("--allow_random_init", action="store_true")
    args = parser.parse_args(argv)
    from ttc.utils.logging import setup_logging
    setup_logging()
    from ttc.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    sr_params = None if args.no_superres else load_sr_params(None)

    cfg_kwargs = {k: getattr(args, k) for k in
                  ("tile_px", "out_size", "n_rows")
                  if getattr(args, k) is not None}
    cfg = InferenceConfig(**cfg_kwargs)
    if args.backend == "forest":
        from ttc.io.forest import ForestFixtureBackend

        backend = ForestFixtureBackend(hw=cfg.tile_px)
    else:
        backend = FixtureBackend(hw=cfg.tile_px)
    model, params = build_model_params(
        args.model_path, allow_random_init=args.allow_random_init)
    predictor = TilePredictor(params, cfg, model)
    run_multiyear(args.x, args.y, args.start_year, args.end_year,
                  args.local_path, backend=backend,
                  predictor=predictor, ul_flag=args.ul_flag,
                  sr_params=sr_params, min_dates=args.min_dates,
                  save_reseg=args.save_reseg)


if __name__ == "__main__":
    main()
