"""Fixed-capacity validity masking: masker(s2, valid)[valid] must equal
masker(s2[valid]) bit-exactly — the guarantee that lets the fused ARD
program mark dates invalid instead of re-running after np.delete
(reference behavior: date deletion + full re-mask,
src/download_and_predict_job.py:841-919)."""
import jax.numpy as jnp
import numpy as np
import pytest

from ttc.preprocess.clouds import identify_clouds_shadows

from tests.test_clouds import _clear_scene, _plant_cloud, _plant_shadow


def _scene(rng, t=9, hw=48):
    img = _clear_scene(rng, t=t, hw=hw)
    img = _plant_cloud(img, 2, 10, 30, 10, 30)
    img = _plant_cloud(img, 5, 0, 14, 20, 44)
    img = _plant_shadow(img, 3, 32, 44, 6, 22)
    dem = (rng.random((hw, hw)) * 40).astype(np.float32)
    return img, dem


@pytest.mark.parametrize("drop", [(0,), (4,), (8,), (2, 5), (0, 1, 8),
                                  (3, 4, 5, 6)])
def test_masked_equals_compacted(rng, drop):
    img, dem = _scene(rng)
    valid = np.ones(img.shape[0], bool)
    valid[list(drop)] = False

    c_masked, f_masked = identify_clouds_shadows(
        jnp.asarray(img), jnp.asarray(dem), valid=jnp.asarray(valid))
    c_comp, f_comp = identify_clouds_shadows(
        jnp.asarray(img[valid]), jnp.asarray(dem))

    np.testing.assert_array_equal(np.asarray(c_masked)[valid],
                                  np.asarray(c_comp))
    np.testing.assert_array_equal(np.asarray(f_masked)[valid],
                                  np.asarray(f_comp))
    # invalid slots report all-cloud / no-fcp
    inv = ~valid
    assert np.all(np.asarray(c_masked)[inv] == 1.0)
    assert np.all(np.asarray(f_masked)[inv] == 0.0)


@pytest.mark.parametrize("drop", [(0,), (8,), (2, 5)])
def test_gapfill_masked_equals_compacted(rng, drop):
    from ttc.preprocess.gapfill import remove_cloud_and_shadows

    img, dem = _scene(rng)
    valid = np.ones(img.shape[0], bool)
    valid[list(drop)] = False

    cs_m, f_m = identify_clouds_shadows(
        jnp.asarray(img), jnp.asarray(dem), valid=jnp.asarray(valid))
    cs_c, f_c = identify_clouds_shadows(jnp.asarray(img[valid]),
                                        jnp.asarray(dem))

    fil_m, int_m, ful_m = remove_cloud_and_shadows(
        jnp.asarray(img), cs_m, f_m, valid=jnp.asarray(valid))
    fil_c, int_c, ful_c = remove_cloud_and_shadows(
        jnp.asarray(img[valid]), cs_c, f_c)

    np.testing.assert_array_equal(np.asarray(fil_m)[valid],
                                  np.asarray(fil_c))
    np.testing.assert_array_equal(np.asarray(int_m)[valid],
                                  np.asarray(int_c))
    np.testing.assert_array_equal(np.asarray(ful_m)[valid],
                                  np.asarray(ful_c))
    # invalid slots: zero fill, full interp, flagged fully-interpolated
    inv = ~valid
    assert np.all(np.asarray(fil_m)[inv] == 0.0)
    assert np.all(np.asarray(int_m)[inv] == 1.0)
    assert np.all(np.asarray(ful_m)[inv])


def test_all_valid_matches_default(rng):
    img, dem = _scene(rng, t=6)
    c_def, f_def = identify_clouds_shadows(jnp.asarray(img),
                                           jnp.asarray(dem))
    c_v, f_v = identify_clouds_shadows(
        jnp.asarray(img), jnp.asarray(dem),
        valid=jnp.ones(img.shape[0], bool))
    np.testing.assert_array_equal(np.asarray(c_def), np.asarray(c_v))
    np.testing.assert_array_equal(np.asarray(f_def), np.asarray(f_v))
