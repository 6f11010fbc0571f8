"""Configuration dataclasses for the inference / training pipelines."""
from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class TileSpec:
    """A 6x6 km processing tile on the global 6300 m grid.

    The reference addresses tiles by integer (x, y) steps from a country
    anchor coordinate, each step 6300 m in the local UTM zone, expanded by
    `expansion` 1/360-degree pixels on each side
    (reference: src/download_and_predict_job.py:154-171,497-499).
    """

    x: int
    y: int
    lon: float  # centroid longitude (WGS84)
    lat: float  # centroid latitude (WGS84)
    expansion: int = 300  # half-width in 10 m pixels => 300 -> ~6.18 km

    @property
    def bbox(self) -> tuple[float, float, float, float]:
        """(min_lon, min_lat, max_lon, max_lat) in decimal degrees."""
        m = 1.0 / 360.0 / 10.0  # one 10 m pixel in degrees at equator scale
        d = self.expansion * m
        return (self.lon - d, self.lat - d, self.lon + d, self.lat + d)


@dataclasses.dataclass(frozen=True)
class InferenceConfig:
    """Static geometry for tile prediction.

    Defaults replicate the production configuration: 618 px tiles, 36
    overlapping 172->158 windows on a 6x6 grid with 7 px halos
    (reference: src/download_and_predict_job.py:60,1295-1317).
    """

    tile_px: int = 618          # H = W of the processed tile raster
    out_size: int = 158         # model output window (SIZE)
    ctx: int = 14               # receptive-field context: input = out + ctx
    halo: int = 7               # extra overlap added around each window
    n_rows: int = 6             # windows per axis
    n_steps: int = 4            # temporal steps fed to the GRU (quarters)
    n_bands: int = 17
    gauss_sigma: float = 36.0   # mosaic blending kernel sigma
    n_temporal_in: int = 12     # monthly steps entering quarterly medians
    regrid_steps: int = 24      # biweekly regrid steps
    max_dates: int = 16         # static bound on raw acquisition count

    @property
    def in_size(self) -> int:
        return self.out_size + self.ctx

    @property
    def n_windows(self) -> int:
        return self.n_rows * self.n_rows


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """ConvGRU U-Net hyperparameters (reference: src/train/train-model.py:64-82)."""

    base_filters: int = 64
    n_bands: int = 17
    length: int = 4
    zoneout: float = 0.75
    gn_groups: int = 8
    out_bias_init: float = -0.7537718  # -log(0.68/0.32), focal-style init

    n_epochs: int = 100
    batch_size: int = 32
    init_lr: float = 8e-4
    cosine_divider: int = 75
    warm_up_steps: int = 5000
    in_size: int = 28
    out_size: int = 14


@dataclasses.dataclass(frozen=True)
class JobConfig:
    """Per-job runtime options (mirrors the reference CLI surface,
    reference: src/download_and_predict_job.py:1653-1721)."""

    country: str = ""
    year: int = 2023
    local_path: str = "tiles/"
    s3_bucket: Optional[str] = None
    model_path: Optional[str] = None
    db_path: Optional[str] = None
    ul_flag: bool = False
    gen_feats: bool = False
    gen_composite: bool = False
    make_training_data: bool = False
    process: bool = True
    redownload: bool = False
    reprocess: bool = False
    length: int = 4
    start: int = 0
    end: Optional[int] = None
