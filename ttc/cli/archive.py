"""Archive finished raw tile data to a separate bucket/folder and
delete the originals (reference: src/archive_data.py:1-109).

Usage:
    python -m ttc.cli.archive --local_path tiles/ \
        --archive_path archive/ [--bucket b --archive_bucket b2]
"""
from __future__ import annotations

import argparse
import logging
import os
import shutil

from ttc.io.store import TileStore

log = logging.getLogger("ttc.archive")


def archive_tile(store: TileStore, archive_root: str, x, y,
                 delete: bool = True) -> bool:
    src = os.path.join(store.tile_dir(x, y), "raw")
    if not os.path.isdir(src):
        return False
    dst = os.path.join(archive_root, str(x), str(y), "raw")
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    shutil.copytree(src, dst, dirs_exist_ok=True)
    if store.bucket:
        store.upload_folder(src, f"archive/{x}/{y}/raw")
    if delete:
        shutil.rmtree(src, ignore_errors=True)
    log.info("archived raw data for tile %s/%s", x, y)
    return True


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--local_path", default="tiles/")
    parser.add_argument("--archive_path", default="archive/")
    parser.add_argument("--bucket", default=None)
    parser.add_argument("--keep", action="store_true")
    args = parser.parse_args(argv)
    from ttc.utils.logging import setup_logging
    setup_logging()

    store = TileStore(args.local_path, bucket=args.bucket)
    n = 0
    if os.path.isdir(args.local_path):
        for x in os.listdir(args.local_path):
            xdir = os.path.join(args.local_path, x)
            if not os.path.isdir(xdir):
                continue
            for y in os.listdir(xdir):
                if archive_tile(store, args.archive_path, x, y,
                                delete=not args.keep):
                    n += 1
    log.info("archived %d tiles", n)


if __name__ == "__main__":
    main()
