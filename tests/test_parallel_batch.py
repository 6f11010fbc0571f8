"""Multi-tile sharded inference on the virtual 8-device CPU mesh."""
import jax
import numpy as np
import pytest

from ttc.core.config import InferenceConfig
from ttc.models.unet import TreeCoverNet
from ttc.parallel.batch import make_batched_predictor, prefetched, run_tile_stream
from ttc.parallel.mesh import make_mesh
from ttc.preprocess.pifs import identify_pifs


def _tile_inputs(rng, hw):
    return {
        "s2_monthly": rng.random((12, hw, hw, 14), np.float32) * 0.4,
        "s1_monthly": rng.random((12, hw, hw, 2), np.float32) * 0.6,
        "slope": rng.random((hw, hw), np.float32) * 0.3,
        "s2_median": rng.random((hw, hw, 14), np.float32) * 0.4,
        "s1_median": rng.random((hw, hw, 2), np.float32) * 0.6,
        "clear_count": np.full((hw, hw), 8.0, np.float32),
    }


@pytest.mark.slow
def test_batched_predictor_sharded_over_mesh():
    mesh = make_mesh(8)
    cfg = InferenceConfig(tile_px=110, out_size=66, n_rows=3)
    model = TreeCoverNet()
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), np.zeros((1, 5, 28, 28, 17), np.float32))
    predictor = make_batched_predictor(params, mesh, cfg, model)

    rng = np.random.default_rng(0)
    batch = {k: np.stack([v] * 8)
             for k, v in _tile_inputs(rng, 110).items()}
    out = np.asarray(predictor(batch))
    assert out.shape == (8, 110, 110)
    assert out.dtype == np.uint8
    # identical tiles -> identical rasters on every shard
    for i in range(1, 8):
        np.testing.assert_array_equal(out[i], out[0])


def test_prefetched_preserves_order():
    items = list(range(20))
    assert list(prefetched(iter(items), depth=3)) == items


@pytest.mark.slow
def test_run_tile_stream_pads_final_batch():
    mesh = make_mesh(4)
    cfg = InferenceConfig(tile_px=110, out_size=66, n_rows=3)
    model = TreeCoverNet()
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), np.zeros((1, 5, 28, 28, 17), np.float32))
    rng = np.random.default_rng(1)
    tiles = [((i, 0), _tile_inputs(rng, 110)) for i in range(6)]
    got = []
    for ids, rasters in run_tile_stream(params, mesh, iter(tiles), cfg,
                                        batch_size=4):
        assert rasters.shape[0] == 4
        got.extend(i for i in ids if i is not None)
    assert got == [(i, 0) for i in range(6)]


def test_identify_pifs_selects_stable(rng):
    n = 2000
    stable = rng.normal(0.3, 0.01, (n // 2, 10)).astype(np.float32)
    noisy_src = rng.random((n // 2, 10)).astype(np.float32)
    noisy_ref = rng.random((n // 2, 10)).astype(np.float32)
    src = np.concatenate([stable, noisy_src])
    ref = np.concatenate([stable + rng.normal(0, 0.005, stable.shape)
                          .astype(np.float32), noisy_ref])
    s_sel, r_sel, idx = identify_pifs(src, ref)
    # most selected pixels come from the stable half
    assert (idx < n // 2).mean() > 0.7
    assert len(s_sel) == n // 10


@pytest.mark.slow
def test_blocks_sharded_over_mesh():
    """Country-scale composition (SURVEY §7 step 6): each mesh device
    predicts one seam-free 2x2 shared-halo block — make_batched_
    predictor with the block window geometry over stitched inputs."""
    from ttc.infer.block import block_config

    mesh = make_mesh(8)
    cfg = InferenceConfig(tile_px=110, out_size=66, n_rows=3)
    bcfg = block_config(cfg, 2)            # 220 px super-tiles
    model = TreeCoverNet()
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), np.zeros((1, 5, 28, 28, 17), np.float32))
    predictor = make_batched_predictor(params, mesh, bcfg, model)

    rng = np.random.default_rng(1)
    batch = {k: np.stack([v] * 8)
             for k, v in _tile_inputs(rng, 220).items()}
    out = np.asarray(predictor(batch))
    assert out.shape == (8, 220, 220)      # 8 blocks = 32 tiles
    for i in range(1, 8):
        np.testing.assert_array_equal(out[i], out[0])
