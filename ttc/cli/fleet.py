"""Fleet runner: shard the tile database across workers and babysit.

Replaces the reference's bash/SSH deployment layer
(reference: plantations_job.sh:1-33, src/check_on_instances.py:1-159):
instead of a shell loop of --start/--end chunks plus a paramiko/tmux
babysitter, a single supervisor process launches N predict-job workers
over disjoint CSV ranges, restarts crashed workers with backoff, and
reports progress. On a multi-host TPU deployment each worker binds one
host/chip; the device mesh inside each worker handles chip-level
parallelism.

Usage:
    python -m ttc.cli.fleet --db_path tiles.csv --workers 4 \
        -- --country X --year 2023
"""
from __future__ import annotations

import argparse
import logging
import subprocess
import sys
import time

log = logging.getLogger("ttc.fleet")


def shard_ranges(n_tiles: int, n_workers: int):
    """Contiguous [start, end) ranges covering the tile list."""
    per = -(-n_tiles // n_workers)
    return [(i * per, min((i + 1) * per, n_tiles))
            for i in range(n_workers) if i * per < n_tiles]


def launch_worker(start: int, end: int, passthrough):
    cmd = [sys.executable, "-m", "ttc.cli.predict_job",
           "--start", str(start), "--end", str(end)] + passthrough
    return subprocess.Popen(cmd)


def supervise(db_path: str, n_workers: int, passthrough,
              max_restarts: int = 5, poll_s: float = 10.0):
    import pandas as pd

    n_tiles = len(pd.read_csv(db_path))
    ranges = shard_ranges(n_tiles, n_workers)
    passthrough = ["--db_path", db_path] + list(passthrough)

    workers = {}
    restarts = {}
    for rng in ranges:
        workers[rng] = launch_worker(*rng, passthrough)
        restarts[rng] = 0
        log.info("launched worker for tiles [%d, %d)", *rng)

    while workers:
        time.sleep(poll_s)
        for rng, proc in list(workers.items()):
            code = proc.poll()
            if code is None:
                continue
            if code == 0:
                log.info("worker [%d, %d) finished", *rng)
                del workers[rng]
            elif restarts[rng] < max_restarts:
                restarts[rng] += 1
                backoff = 10 * restarts[rng]
                log.warning("worker [%d, %d) died (code %s); restart "
                            "%d in %ds", rng[0], rng[1], code,
                            restarts[rng], backoff)
                time.sleep(backoff)
                workers[rng] = launch_worker(*rng, passthrough)
            else:
                log.error("worker [%d, %d) exceeded restart budget",
                          *rng)
                del workers[rng]


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--db_path", required=True)
    parser.add_argument("--workers", type=int, default=2)
    parser.add_argument("--max_restarts", type=int, default=5)
    args, passthrough = parser.parse_known_args(argv)
    if passthrough and passthrough[0] == "--":
        passthrough = passthrough[1:]
    from ttc.utils.logging import setup_logging
    setup_logging()
    supervise(args.db_path, args.workers, passthrough,
              args.max_restarts)


if __name__ == "__main__":
    main()
