"""Cloud/shadow masking and gap-fill: behavioral + reference parity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ttc.preprocess.clouds import (
    detect_pfcp,
    hollstein_seed,
    identify_clouds_shadows,
    snow_filter,
)
from ttc.preprocess.gapfill import (
    interp_weights,
    make_aligned_mosaic,
    remove_cloud_and_shadows,
)


def _clear_scene(rng, t=6, hw=48):
    """Synthetic vegetated scene: dark visible, bright NIR."""
    img = np.zeros((t, hw, hw, 10), np.float32)
    base = rng.random((hw, hw)) * 0.02
    img[..., 0] = 0.02 + base          # blue
    img[..., 1] = 0.04 + base          # green
    img[..., 2] = 0.03 + base          # red
    img[..., 3] = 0.3 + base           # nir
    img[..., 4:8] = 0.25
    img[..., 7] = 0.28 + base          # b8a
    img[..., 8] = 0.12 + base          # b11
    img[..., 9] = 0.08
    img += rng.normal(0, 0.002, img.shape).astype(np.float32)
    return np.clip(img, 0.01, 1.0)


def _plant_cloud(img, t, y0, y1, x0, x1):
    img[t, y0:y1, x0:x1, :3] = 0.35    # bright white visible
    img[t, y0:y1, x0:x1, 3] = 0.45
    img[t, y0:y1, x0:x1, 4:8] = 0.4
    img[t, y0:y1, x0:x1, 7] = 0.42
    img[t, y0:y1, x0:x1, 8] = 0.3
    return img


def _plant_shadow(img, t, y0, y1, x0, x1):
    img[t, y0:y1, x0:x1, :] *= 0.25
    return img


def test_planted_cloud_detected(rng):
    img = _clear_scene(rng)
    img = _plant_cloud(img, 2, 10, 30, 10, 30)
    dem = np.zeros((48, 48), np.float32)
    clouds, _ = identify_clouds_shadows(jnp.asarray(img),
                                        jnp.asarray(dem))
    clouds = np.asarray(clouds)
    # cloud interior flagged on date 2
    assert clouds[2, 15:25, 15:25].mean() > 0.9
    # clear dates mostly unflagged
    assert clouds[0].mean() < 0.25


def test_planted_shadow_detected(rng):
    img = _clear_scene(rng, t=8)
    img = _plant_shadow(img, 3, 12, 32, 12, 32)
    # high-relief DEM: shadows allowed without adjacent clouds
    # (otherwise the plausibility pruning removes cloud-free shadows,
    # reference :1617-1626)
    dem = np.full((48, 48), 35.0, np.float32)
    clouds, _ = identify_clouds_shadows(jnp.asarray(img),
                                        jnp.asarray(dem))
    clouds = np.asarray(clouds)
    assert clouds[3, 16:28, 16:28].mean() > 0.9


def test_haze_flags_whole_image(rng):
    img = _clear_scene(rng, t=6)
    # date 4: uniformly bright, flat — classic haze signature
    img[4, ..., :3] = 0.25 + rng.normal(0, 0.001, (48, 48, 1))
    dem = np.zeros((48, 48), np.float32)
    clouds, _ = identify_clouds_shadows(jnp.asarray(img),
                                        jnp.asarray(dem))
    assert np.asarray(clouds)[4].mean() == 1.0


def test_hollstein_seed_flags_bright_white():
    img = np.full((2, 40, 40, 10), 0.1, np.float32)
    img[..., 8] = 0.1
    img[1, 5:35, 5:35, 7] = 0.3   # b8a high
    img[1, 5:35, 5:35, 1] = 0.4   # green high
    img[1, 5:35, 5:35, 5] = 0.3
    img[1, 5:35, 5:35, 8] = 0.3   # b6/b11 < 4.292
    seed = np.asarray(hollstein_seed(jnp.asarray(img)))
    assert seed[1, 15:25, 15:25].mean() > 0.9
    assert seed[0].mean() == 0.0


def test_snow_filter_matches_reference(rng):
    from tests.reference_harness import load_reference_fns, reference_available
    if not reference_available():
        pytest.skip("no reference")
    # snow_filter is nested in the reference; the standalone copy in
    # align_interp_array has identical thresholds — verify behaviorally:
    img = rng.random((3, 20, 20, 10)).astype(np.float32)
    prob = np.asarray(snow_filter(jnp.asarray(img)))
    assert prob.shape == (3, 20, 20)
    assert prob.min() >= 0 and prob.max() <= 1
    # snow pixel: high green, low swir, high nir + blue
    img2 = np.zeros((1, 8, 8, 10), np.float32)
    img2[..., 0] = 0.5
    img2[..., 1] = 0.6
    img2[..., 2] = 0.5
    img2[..., 3] = 0.6
    img2[..., 8] = 0.1
    assert np.asarray(snow_filter(jnp.asarray(img2))).min() == 1.0


def test_detect_pfcp_shapes(rng):
    img = _clear_scene(rng, t=4)
    dem = np.zeros((48, 48), np.float32)
    fcps, pfps = detect_pfcp(jnp.asarray(img), jnp.asarray(dem))
    assert fcps.shape == (4, 48, 48)
    # no urban mask -> no false-cloud candidates
    assert np.asarray(fcps).sum() == 0


def test_interp_weights_feathering(rng):
    mask = np.zeros((2, 48, 48), np.float32)
    mask[0, 20:28, 20:28] = 1.0
    w = np.asarray(interp_weights(jnp.asarray(mask), 12.0, closing=15))
    assert w[0, 24, 24] == 1.0                # inside mask
    assert w[0, 24, 40] < w[0, 24, 30]        # decays with distance
    assert w[1].sum() == 0.0                  # untouched date stays 0


def test_interp_weights_close_to_reference(rng):
    from tests.reference_harness import load_reference_fns, reference_available
    if not reference_available():
        pytest.skip("no reference")
    fns = load_reference_fns("src/preprocessing/cloud_removal.py",
                             ["id_areas_to_interp"])
    from scipy import ndimage

    mask = (rng.random((3, 48, 48)) < 0.08).astype(np.float32)
    mask = np.stack([ndimage.binary_dilation(m, iterations=2)
                     for m in mask]).astype(np.float32)
    ref = fns["id_areas_to_interp"](mask.copy(), mask.copy(), None, None,
                                    None)
    got = np.asarray(interp_weights(jnp.asarray(mask), 12.0, closing=15))
    # chamfer-vs-exact EDT gives small deviations in the feather ring
    assert np.abs(got - ref).mean() < 0.05
    np.testing.assert_array_equal(got == 1.0, ref == 1.0)


def test_mosaic_reconstructs_constant_scene(rng):
    img = _clear_scene(rng, t=5)
    interp = np.zeros((5, 48, 48), np.float32)
    interp[2, 10:30, 10:30] = 1.0
    mosaic = np.asarray(make_aligned_mosaic(jnp.asarray(img),
                                            jnp.asarray(interp)))
    assert mosaic.shape == (48, 48, 10)
    # mosaic stays within the stack envelope
    assert np.all(mosaic >= img.min(axis=0) - 1e-5)
    assert np.all(mosaic <= img.max(axis=0) + 1e-5)


def test_gapfill_replaces_cloudy_region(rng):
    img = _clear_scene(rng, t=6)
    clean = img.copy()
    img = _plant_cloud(img, 2, 14, 34, 14, 34)
    mask = np.zeros((6, 48, 48), np.float32)
    mask[2, 14:34, 14:34] = 1.0
    pfcps = np.zeros((6, 48, 48), np.float32)
    filled, interp, fully = remove_cloud_and_shadows(
        jnp.asarray(img), jnp.asarray(mask), jnp.asarray(pfcps))
    filled = np.asarray(filled)
    # cloud interior now close to the clean scene's values
    err = np.abs(filled[2, 20:28, 20:28, :4]
                 - clean[2, 20:28, 20:28, :4]).mean()
    assert err < 0.05, err
    assert not bool(np.asarray(fully)[2])
