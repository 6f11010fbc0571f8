"""Band registry and normalization constants.

The model consumes 17 input channels per time step, laid out as in the
reference pipeline (reference: src/download_and_predict_job.py:1398-1407):

  0-9   Sentinel-2 optical:  B02, B03, B04, B08 (10 m native),
                             B05, B06, B07, B8A, B11, B12 (20 m,
                             super-resolved to 10 m)
  10    DEM slope (degrees / 90)
  11-12 Sentinel-1 VV, VH (gamma0 terrain-corrected, dB-scaled to [0,1])
  13-16 Spectral indices: EVI, BI, MSAVI2, GRNDVI

Normalization is per-band midrange scaling to [-1, 1] using the fixed
vectors below (reference: src/download_and_predict_job.py:1829-1842 and
src/train/train-model.py:54-61).
"""
from __future__ import annotations

import numpy as np

S2_BANDS_10M = ("B02", "B03", "B04", "B08")
S2_BANDS_20M = ("B05", "B06", "B07", "B8A", "B11", "B12")

BAND_NAMES = (
    "B02", "B03", "B04", "B08",          # 0-3   10 m optical
    "B05", "B06", "B07", "B8A",          # 4-7   20 m red-edge / narrow NIR
    "B11", "B12",                        # 8-9   20 m SWIR
    "SLOPE",                             # 10    DEM slope
    "VV", "VH",                          # 11-12 Sentinel-1
    "EVI", "BI", "MSAVI2", "GRNDVI",     # 13-16 indices
)
N_BANDS = len(BAND_NAMES)

# Per-band clip minima/maxima for midrange normalization.
NORM_MIN = np.array(
    [
        0.006576638437476157, 0.0162050812542916, 0.010040436408026246,
        0.013351644159609368, 0.01965362020294499, 0.014229037918669413,
        0.015289539940489814, 0.011993591210803388, 0.008239871824216068,
        0.006546120393682765, 0.0, 0.0, 0.0, -0.1409399364817101,
        -0.4973397113668104, -0.09731556326714398, -0.7193834232943873,
    ],
    dtype=np.float32,
)
NORM_MAX = np.array(
    [
        0.2691233691920348, 0.3740291447318227, 0.5171435111009385,
        0.6027466239414053, 0.5650263218127718, 0.5747005416952773,
        0.5933928435187305, 0.6034943160143434, 0.7472037842374304,
        0.7000076295109483, 0.509269855802243, 0.948334642387533,
        0.6729257769285485, 0.8177635298774327, 0.35768999002433816,
        0.7545951919107605, 0.7602693339366691,
    ],
    dtype=np.float32,
)

assert NORM_MIN.shape == (N_BANDS,) and NORM_MAX.shape == (N_BANDS,)

# Clip ranges used when packing the 4 index bands into training samples
# (reference: src/download_and_predict_job.py:1239-1253).
INDICES_MIN = NORM_MIN[13:]
INDICES_MAX = NORM_MAX[13:]
