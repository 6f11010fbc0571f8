"""Canopy-structured synthetic scenes with ground-truth tree cover.

The plain FixtureBackend synthesizes uniformly vegetated tiles — fine
for exercising the pipeline mechanics but useless for accuracy work:
there is nothing to learn or to score. ForestFixtureBackend generates
scenes where a smooth random canopy-fraction field drives every band's
reflectance (trees: high NIR/B8A, low red/SWIR, strong C-band
backscatter, evergreen phenology; background: brighter red/SWIR with
grass phenology), so

  * training patches cut from the processed ARD have real labels,
  * end-to-end rasters can be scored against known tree cover
    (the BASELINE "<1% mean abs tree-cover deviation" bar becomes a
    measurable quantity on fixtures).

Spectral separations follow the usual optical forest signatures the
reference model exploits via its EVI/BI/MSAVI2/GRNDVI inputs
(reference: src/preprocessing/indices.py:4-54, band layout
src/download_and_predict_job.py:1398-1407).
"""
from __future__ import annotations

import numpy as np

from ttc.io.acquisition import (
    FixtureBackend,
    RawTile,
    to_int16_strict,
)


def _box_blur(field: np.ndarray, radius: int, passes: int = 3):
    """Separable repeated box blur (quasi-Gaussian, no scipy)."""
    width = 2 * radius + 1
    for _ in range(passes):
        for axis in (0, 1):
            pad = [(0, 0), (0, 0)]
            pad[axis] = (radius, radius)
            padded = np.pad(field, pad, mode="wrap")
            zshape = list(padded.shape)
            zshape[axis] = 1
            cs = np.concatenate(
                [np.zeros(zshape), np.cumsum(padded, axis=axis)],
                axis=axis)
            hi = [slice(None)] * 2
            lo = [slice(None)] * 2
            hi[axis] = slice(width, None)
            lo[axis] = slice(None, -width)
            field = (cs[tuple(hi)] - cs[tuple(lo)]) / width
    return field


def make_canopy(rng: np.random.Generator, hw: int,
                density: float | None = None,
                blob_radius: int = 9,
                soft: float = 0.35) -> np.ndarray:
    """Smooth canopy-fraction field in [0, 1] with expected mean cover
    ~= density (sampled from a wide mixture when not given)."""
    if density is None:
        u = rng.random()
        if u < 0.18:
            density = rng.uniform(0.0, 0.02)
        elif u < 0.35:
            density = rng.uniform(0.02, 0.15)
        else:
            density = rng.uniform(0.15, 0.9)
    field = _box_blur(rng.standard_normal((hw, hw)), blob_radius)
    field = (field - field.mean()) / (field.std() + 1e-9)
    thr = np.quantile(field, 1.0 - density) if density > 0 else 99.0
    # soft edges: ~2-px transition from 0 to 1 canopy fraction
    return np.clip(1.0 / (1.0 + np.exp(-(field - thr) / soft)), 0.0, 1.0)


def _scene_bands(canopy: np.ndarray, doy: np.ndarray, base: np.ndarray,
                 rng: np.random.Generator, grass_phase: float = 110.0,
                 tree_phase: float = 160.0,
                 noise: float = 0.004) -> np.ndarray:
    """(T, H, W, 10) surface reflectance driven by the canopy field."""
    t = len(doy)
    hw = canopy.shape[0]
    c = canopy[None]                                  # (1, H, W)
    grass = 0.5 + 0.5 * np.sin(2 * np.pi * (doy - grass_phase) / 365.0)
    tree = 0.85 + 0.15 * np.sin(2 * np.pi * (doy - tree_phase) / 365.0)
    g = grass[:, None, None]
    tt = tree[:, None, None]
    b = base[None]

    s2 = np.zeros((t, hw, hw, 10), np.float32)
    nir = (0.16 + 0.10 * g) * (1 - c) + (0.27 + 0.05 * tt) * c
    red = (0.030 + 0.045 * (1.1 - 0.8 * g)) * (1 - c) + 0.021 * c
    s2[..., 0] = 0.018 + 0.012 * (1 - c) + 0.5 * b          # B02
    s2[..., 1] = 0.040 + 0.022 * (1 - c) * (1.1 - 0.5 * g) \
        + 0.012 * c + b                                      # B03
    s2[..., 2] = red + b                                     # B04
    s2[..., 3] = nir + b                                     # B08
    s2[..., 4] = 0.55 * red + 0.25 * nir                     # B05
    s2[..., 5] = 0.25 * red + 0.55 * nir                     # B06
    s2[..., 6] = 0.10 * red + 0.80 * nir                     # B07
    s2[..., 7] = 0.95 * nir                                  # B8A
    s2[..., 8] = (0.21 + 0.05 * (1 - g)) * (1 - c) \
        + 0.105 * c + b                                      # B11
    s2[..., 9] = (0.135 + 0.04 * (1 - g)) * (1 - c) \
        + 0.052 * c + 0.5 * b                                # B12
    s2 += rng.normal(0, noise, s2.shape).astype(np.float32)
    return s2


class ForestFixtureBackend(FixtureBackend):
    """FixtureBackend variant whose scenes contain a learnable,
    scoreable canopy structure. `canopy(x, y)` returns the ground-truth
    tree-cover fraction field for a tile.

    The class attributes parametrize the scene distribution; see
    ShiftedForestBackend for a deliberately out-of-family variant used
    by the generalization gate (tests/test_generalization.py)."""

    blob_radius = 9          # canopy texture scale
    soft = 0.35              # canopy edge softness
    grass_phase = 110.0      # background phenology peak (doy)
    tree_phase = 160.0
    band_noise = 0.004       # per-band sensor noise sigma
    speckle_shape = 8.0      # S1 gamma speckle (smaller = noisier)
    s1_cal = (1.0, 1.0)      # VV/VH calibration multipliers
    cloud_style = "square"   # cloud morphology

    def __init__(self, seed: int = 0, n_dates: int = 10, hw: int = 110,
                 cloud_fraction: float = 0.15,
                 density: float | None = None):
        super().__init__(seed=seed, n_dates=n_dates, hw=hw,
                         cloud_fraction=cloud_fraction)
        self.density = density

    def _canopy_rng(self, tile_x: int, tile_y: int):
        return np.random.default_rng(
            [self.seed, 7919 + tile_x * 31 + tile_y, 1234])

    def canopy(self, tile_x: int, tile_y: int) -> np.ndarray:
        return make_canopy(self._canopy_rng(tile_x, tile_y), self.hw,
                           self.density, blob_radius=self.blob_radius,
                           soft=self.soft)

    def _add_cloud(self, s2, clouds_prev, i, rng):
        hw = self.hw
        if self.cloud_style == "square":
            cx, cy = rng.integers(4, max(5, hw - 40), 2)
            sz = int(rng.integers(15, 45))
            s2[i, cx:cx + sz, cy:cy + sz, :3] += 0.3
            s2[i, cx:cx + sz, cy:cy + sz, 3:] += 0.15
            clouds_prev[i, cx * 28 // hw:(cx + sz) * 28 // hw,
                        cy * 28 // hw:(cy + sz) * 28 // hw] = 80.0
            return
        # irregular blob clouds: thresholded blurred noise with soft
        # brightness profile (different morphology + edge statistics)
        field = _box_blur(rng.standard_normal((hw, hw)), 6)
        field = (field - field.mean()) / (field.std() + 1e-9)
        blob = np.clip((field - 1.1) / 0.4, 0.0, 1.0)
        s2[i, ..., :3] += (0.35 * blob)[..., None]
        s2[i, ..., 3:] += (0.12 * blob)[..., None]
        small = blob.reshape(28, hw // 28, 28, hw // 28).mean((1, 3)) \
            if hw % 28 == 0 else np.full((28, 28), blob.mean())
        clouds_prev[i] = np.maximum(clouds_prev[i], 100.0 * small)

    def fetch(self, tile_x: int, tile_y: int, bbox, year: int) -> RawTile:
        rng = np.random.default_rng(
            [self.seed * 7919 + tile_x * 31 + tile_y, 77])
        t, hw = self.n_dates, self.hw
        canopy = self.canopy(tile_x, tile_y)
        dates = np.sort(rng.choice(np.arange(5, 360), t, replace=False))

        base = rng.random((hw, hw)).astype(np.float32) * 0.03
        s2 = _scene_bands(canopy, dates, base, rng,
                          grass_phase=self.grass_phase,
                          tree_phase=self.tree_phase,
                          noise=self.band_noise)

        clouds_prev = np.zeros((t, 28, 28), np.float32)
        for i in range(t):
            if rng.random() < self.cloud_fraction * 2:
                self._add_cloud(s2, clouds_prev, i, rng)
        s2 = np.clip(s2, 0.005, 0.99)

        q_dates = np.array([45, 136, 227, 318])
        cal_vv, cal_vh = self.s1_cal
        vv = (cal_vv * (0.022 * (1 - canopy)
                        + 0.060 * canopy))[None, ..., None]
        vh = (cal_vh * (0.006 * (1 - canopy)
                        + 0.026 * canopy))[None, ..., None]
        mean_lin = np.concatenate([vv, vh], axis=-1)      # (1, H, W, 2)
        k = self.speckle_shape
        s1_lin = np.clip(
            mean_lin * rng.gamma(k, 1 / k, (4, hw, hw, 2)),
            1e-4, 1.0).astype(np.float32)

        import jax.numpy as jnp

        from ttc.ops.slope import calc_slope

        elev = (300 + 80 * np.sin(np.linspace(0, 4, hw + 2))[:, None]
                + rng.normal(0, 2, (hw + 2, hw + 2))).astype(np.float32)
        dem = np.asarray(calc_slope(jnp.asarray(elev), 10.0, 10.0,
                                    min_slope=0.02))[1:-1, 1:-1]

        return RawTile(
            s2_10=to_int16_strict(s2[..., :4]),
            s2_20=to_int16_strict(s2[:, ::2, ::2, 4:]),
            s2_dates=dates,
            clouds=clouds_prev / 100.0,
            s1=to_int16_strict(s1_lin),
            s1_dates=q_dates,
            dem=dem,
        )


class DomainRandomizedBackend(ForestFixtureBackend):
    """Domain-randomized synthetic family: every SEED draws its own
    generator parameters from ranges spanning (and exceeding) both
    fixed families, so a training mix containing it sees a continuum
    of canopy textures, phenologies, noise levels, cloud morphologies
    and S1 calibrations instead of two point distributions. Held-out
    seeds are therefore genuinely unseen parameter combinations —
    the eval side of the round-5 domain-randomized retrain
    (tests/test_generalization.py; stands in for the reference's
    real-data validation loop, reference README.md:15)."""

    def __init__(self, seed: int = 0, n_dates: int = 10, hw: int = 110,
                 cloud_fraction: float = 0.15,
                 density: float | None = None):
        super().__init__(seed=seed, n_dates=n_dates, hw=hw,
                         cloud_fraction=cloud_fraction, density=density)
        prng = np.random.default_rng([seed, 424242])
        self.blob_radius = int(prng.integers(3, 13))
        self.soft = float(prng.uniform(0.10, 0.50))
        self.grass_phase = float(prng.uniform(40.0, 150.0))
        self.tree_phase = float(prng.uniform(140.0, 220.0))
        self.band_noise = float(prng.uniform(0.003, 0.008))
        self.speckle_shape = float(prng.uniform(3.0, 10.0))
        self.s1_cal = (float(prng.uniform(0.8, 1.2)),
                       float(prng.uniform(0.8, 1.2)))
        self.cloud_style = str(prng.choice(["square", "blob"]))


class ShiftedForestBackend(ForestFixtureBackend):
    """Distribution-shifted synthetic family for generalization evals.

    Same physics, different statistics than the family the release
    weights trained on: fragmented fine-grained canopy texture with
    sharp edges, phase-shifted background phenology, 1.5x sensor
    noise, irregular blob clouds instead of squares, noisier S1
    speckle with a VV/VH calibration offset. Ground truth stays the
    canopy field, so accuracy remains scoreable
    (tests/test_generalization.py records the in-family vs
    shifted-family gap; stands in for the reference's real-data
    validation loop, reference README.md:15)."""

    blob_radius = 4
    soft = 0.15
    grass_phase = 70.0
    tree_phase = 190.0
    band_noise = 0.006
    speckle_shape = 4.0
    s1_cal = (1.15, 0.85)
    cloud_style = "blob"
