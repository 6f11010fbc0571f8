"""Tile store: the reference's S3/local file layout, cloud-gated.

Key schema (reference: src/download_and_predict_job.py:507-517,
src/downloading/io.py:129-201):

  {year}/{raw|processed|tiles|ard|composite|change}/{x}/{y}/...
  raw/{clouds,misc,s1,s2_10,s2_20}/...

Local filesystem is the primary backend; S3 (boto3) is attached when
credentials are configured. Restartability is file-schema based, like
the reference's idempotent tile skip (io.py:204-226).
"""
from __future__ import annotations

import os
import shutil
from typing import Optional

RAW_SUBFOLDERS = ("clouds", "misc", "s1", "s2_10", "s2_20")


class TileStore:
    def __init__(self, local_root: str, bucket: Optional[str] = None,
                 s3_prefix: str = ""):
        self.root = local_root
        self.bucket = bucket
        self.prefix = s3_prefix
        self._s3 = None
        if bucket:
            try:
                import boto3  # gated: not part of the baked image

                self._s3 = boto3.client("s3")
            except Exception:
                self._s3 = None

    # ---------------- local layout

    def tile_dir(self, x, y) -> str:
        return os.path.join(self.root, str(x), str(y))

    def make_tile_folders(self, x, y) -> str:
        """raw/{clouds,misc,s1,s2_10,s2_20} skeleton
        (reference: io.py:129-150)."""
        base = self.tile_dir(x, y)
        for sub in RAW_SUBFOLDERS:
            os.makedirs(os.path.join(base, "raw", sub), exist_ok=True)
        os.makedirs(os.path.join(base, "processed"), exist_ok=True)
        return base

    def raw_path(self, x, y, group: str, name: str) -> str:
        return os.path.join(self.tile_dir(x, y), "raw", group, name)

    def processed_path(self, x, y, window_y, window_x) -> str:
        return os.path.join(self.tile_dir(x, y), "processed",
                            str(window_y), f"{window_x}.npy")

    def make_subtile_folders(self, x, y, windows) -> None:
        """Per-window output dirs (reference: io.py:341-352)."""
        for wx, wy, *_ in windows:
            os.makedirs(os.path.join(self.tile_dir(x, y), "processed",
                                     str(wy)), exist_ok=True)

    def final_tif_path(self, x, y, suffix: str = "_FINAL") -> str:
        return os.path.join(self.tile_dir(x, y),
                            f"{x}X{y}Y{suffix}.tif")

    def cleanup_tile(self, x, y) -> None:
        shutil.rmtree(self.tile_dir(x, y), ignore_errors=True)

    # ---------------- S3 keys (reference schema)

    def s3_key(self, year, stage, x, y, name) -> str:
        return f"{self.prefix}{year}/{stage}/{x}/{y}/{name}"

    def tile_done(self, year, x, y, suffix: str = "_FINAL") -> bool:
        """Idempotency: finished locally or on S3
        (reference: io.py:204-226)."""
        for sfx in ("_SMOOTH_XY", "_SMOOTH_X", "_SMOOTH_Y", suffix):
            if os.path.exists(self.final_tif_path(x, y, sfx)):
                return True
        if self._s3:
            key = self.s3_key(year, "tiles", x, y, f"{x}X{y}Y{suffix}.tif")
            try:
                self._s3.head_object(Bucket=self.bucket, Key=key)
                return True
            except Exception:
                return False
        return False

    # ---------------- transfers (no-ops without S3)

    def upload(self, local_path: str, key: str) -> bool:
        if not self._s3:
            return False
        self._s3.upload_file(local_path, self.bucket, key)
        return True

    def upload_folder(self, local_dir: str, key_prefix: str) -> int:
        n = 0
        for base, _, files in os.walk(local_dir):
            for fname in files:
                rel = os.path.relpath(os.path.join(base, fname),
                                      local_dir)
                if self.upload(os.path.join(base, fname),
                               f"{key_prefix}/{rel}"):
                    n += 1
        return n

    def download_file(self, key: str, local_path: str) -> bool:
        if not self._s3:
            return os.path.exists(local_path)
        os.makedirs(os.path.dirname(local_path), exist_ok=True)
        self._s3.download_file(self.bucket, key, local_path)
        return True

    def download_folder(self, key_prefix: str, local_dir: str) -> int:
        if not self._s3:
            return 0
        n = 0
        paginator = self._s3.get_paginator("list_objects_v2")
        for page in paginator.paginate(Bucket=self.bucket,
                                       Prefix=key_prefix):
            for obj in page.get("Contents", []):
                rel = os.path.relpath(obj["Key"], key_prefix)
                dest = os.path.join(local_dir, rel)
                os.makedirs(os.path.dirname(dest), exist_ok=True)
                self._s3.download_file(self.bucket, obj["Key"], dest)
                n += 1
        return n

    def delete_remote_folder(self, key_prefix: str) -> None:
        if not self._s3:
            return
        paginator = self._s3.get_paginator("list_objects_v2")
        for page in paginator.paginate(Bucket=self.bucket,
                                       Prefix=key_prefix):
            objs = [{"Key": o["Key"]} for o in page.get("Contents", [])]
            if objs:
                self._s3.delete_objects(Bucket=self.bucket,
                                        Delete={"Objects": objs})
