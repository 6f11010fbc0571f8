"""Quantified parity of the cloud/shadow masker vs the REFERENCE
implementation executed through the AST harness
(reference: src/preprocessing/cloud_removal.py:1215-1677 and
detect_pfcp :1109-1212).

On canopy-structured scenes with planted cloud/shadow boxes:
  * mask IoU >= 0.70 (measured 0.75-0.78 across seeds)
  * planted-artifact recall >= 0.95 (reference reaches 1.0; ours is
    slightly tighter, 0.98-1.0)
  * our mask is the tighter one — total masked fraction within
    [0.6x, 1.1x] of the reference's
  * downstream ARD impact: gap-filled reflectance cubes built from the
    two masks agree to <1% mean abs reflectance

Known intentional deviations driving the gap (module docstring of
ttc/preprocess/clouds.py): chamfer capped-EDT vs exact EDT, and
fixed-shape masked statistics vs the reference's nan-deletion — both
enlarge/shrink mask *borders*, which the IoU + recall + raster-delta
bounds quantify.
"""
import numpy as np
import pytest

from tests.reference_harness import load_reference_fns, reference_available

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not reference_available(),
                       reason="reference tree unavailable"),
]


@pytest.fixture(scope="module")
def ref_masker():
    from scipy import ndimage, signal

    class BN:
        nanmedian = staticmethod(np.nanmedian)
        nanmin = staticmethod(np.nanmin)
        nanmax = staticmethod(np.nanmax)

    def resize(x, shape, order=0):
        if x.shape == tuple(shape):
            return x
        return ndimage.zoom(x.astype(np.float32),
                            [t / s for t, s in zip(shape, x.shape)],
                            order=0)

    return load_reference_fns(
        "src/preprocessing/cloud_removal.py",
        ["detect_pfcp", "identify_clouds_shadows"],
        extra_ns={"bn": BN, "ndimage": ndimage, "resize": resize,
                  "signal": signal,
                  "gaussian_filter": ndimage.gaussian_filter},
    )["identify_clouds_shadows"]


def make_scene(seed, t_total=9, hw=64, n_cloud=4):
    """Forest scene + planted bright clouds and paired dark shadows."""
    from ttc.io.forest import _scene_bands, make_canopy

    rng = np.random.default_rng(seed)
    canopy = make_canopy(rng, hw, density=0.4)
    dates = np.sort(rng.choice(np.arange(5, 360), t_total,
                               replace=False))
    base = rng.random((hw, hw)).astype(np.float32) * 0.03
    s2 = _scene_bands(canopy, dates, base, rng)
    truth = np.zeros((t_total, hw, hw), bool)
    for _ in range(n_cloud):
        t = rng.integers(0, t_total)
        cx, cy = rng.integers(2, hw - 22, 2)
        sz = int(rng.integers(10, 20))
        s2[t, cx:cx + sz, cy:cy + sz, :3] += 0.35
        s2[t, cx:cx + sz, cy:cy + sz, 3:] += 0.18
        truth[t, cx:cx + sz, cy:cy + sz] = True
        sx, sy = min(cx + sz + 5, hw - sz - 1), cy
        s2[t, sx:sx + sz, sy:sy + sz, :] *= 0.25
        truth[t, sx:sx + sz, sy:sy + sz] = True
    dem = (np.random.default_rng(seed).random((hw, hw)) * 20
           ).astype(np.float32)
    return np.clip(s2, 0.005, 1.2), truth, dem


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_mask_iou_and_recall(ref_masker, seed):
    import jax.numpy as jnp

    from ttc.preprocess.clouds import identify_clouds_shadows

    img, truth, dem = make_scene(seed)
    # reference returns (clouds_and_shadows, fcps)
    ref_cs = np.asarray(ref_masker(img.copy(), dem, None)[0]) > 0
    our_cs = np.asarray(identify_clouds_shadows(
        jnp.asarray(img), jnp.asarray(dem))[0]) > 0

    iou = (our_cs & ref_cs).sum() / max((our_cs | ref_cs).sum(), 1)
    rec_ours = (our_cs & truth).sum() / truth.sum()
    rec_ref = (ref_cs & truth).sum() / truth.sum()
    ratio = our_cs.mean() / max(ref_cs.mean(), 1e-9)

    assert iou >= 0.70, f"mask IoU {iou:.3f}"
    assert rec_ours >= 0.95, f"planted recall {rec_ours:.3f}"
    assert rec_ref >= 0.99  # sanity: harness executed the real masker
    assert 0.6 <= ratio <= 1.1, f"masked-fraction ratio {ratio:.2f}"


def test_ard_cube_delta(ref_masker):
    """Gap-filled reflectance built from the two masks must agree to
    <1% mean abs reflectance (the <1% tree-cover north star bounds the
    tolerable upstream drift)."""
    import jax.numpy as jnp

    from ttc.preprocess.clouds import identify_clouds_shadows
    from ttc.preprocess.gapfill import remove_cloud_and_shadows

    img, _, dem = make_scene(3)
    ref_cs = (np.asarray(ref_masker(img.copy(), dem, None)[0]) > 0
              ).astype(np.float32)
    our_cs, our_fcps = identify_clouds_shadows(jnp.asarray(img),
                                               jnp.asarray(dem))

    filled_ours, _, _ = remove_cloud_and_shadows(
        jnp.asarray(img), our_cs, our_fcps)
    filled_ref, _, _ = remove_cloud_and_shadows(
        jnp.asarray(img), jnp.asarray(ref_cs), our_fcps)
    delta = float(jnp.mean(jnp.abs(filled_ours - filled_ref)))
    assert delta < 0.01, f"ARD cube delta {delta:.4f}"
