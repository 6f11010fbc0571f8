from ttc.core.bands import (
    BAND_NAMES,
    N_BANDS,
    NORM_MAX,
    NORM_MIN,
    S2_BANDS_10M,
    S2_BANDS_20M,
)
from ttc.core.codecs import from_uint16, to_db, to_uint16
from ttc.core.config import InferenceConfig, TileSpec

__all__ = [
    "BAND_NAMES",
    "N_BANDS",
    "NORM_MAX",
    "NORM_MIN",
    "S2_BANDS_10M",
    "S2_BANDS_20M",
    "from_uint16",
    "to_db",
    "to_uint16",
    "InferenceConfig",
    "TileSpec",
]
