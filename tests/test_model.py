"""Model wiring tests: shapes, receptive field, zoneout semantics, and
train-mode stochastic layers."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ttc.models.convgru import BiConvGRU, ConvGRUCell, ZoneoutConvGRU
from ttc.models.layers import (
    GroupNorm,
    PartialWSConv,
    apply_dropblock,
    dropblock_mask,
    partial_conv_ratio,
    standardize_kernel,
)
from ttc.models.unet import TreeCoverNet


def _init_and_apply(model, x, **kwargs):
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    return params, jax.jit(
        lambda p, b: model.apply(p, b, **kwargs))(params, x)


def test_unet_shape_training_size():
    model = TreeCoverNet()
    x = jnp.zeros((2, 5, 28, 28, 17))
    _, out = _init_and_apply(model, x)
    assert out.shape == (2, 14, 14)


@pytest.mark.slow
def test_unet_shape_production_size():
    model = TreeCoverNet()
    x = jnp.zeros((1, 5, 172, 172, 17))
    _, out = _init_and_apply(model, x)
    assert out.shape == (1, 158, 158)


def test_unet_output_range():
    model = TreeCoverNet()
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (1, 5, 28, 28, 17)),
                    jnp.float32)
    _, out = _init_and_apply(model, x)
    out = np.asarray(out)
    assert np.all(out > 0) and np.all(out < 1)


def test_zoneout_inference_is_state_ema():
    """final_state must equal the EMA of per-step outputs with factor
    (1-p), matching the reference ZoneoutWrapper at inference."""
    model = ZoneoutConvGRU(filters=8, zoneout=0.75)
    x = jnp.asarray(np.random.default_rng(1).normal(0, 1, (1, 4, 12, 12, 5)),
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    outputs, final = model.apply(params, x)
    assert outputs.shape == (1, 4, 12, 12, 8)

    # Recompute the EMA from raw cell outputs: the carry entering step t
    # differs from outputs, so rebuild with the cell directly.
    cell = ConvGRUCell(filters=8)
    cell_params = {"params": params["params"]["cell"]}
    carry = jnp.zeros((1, 12, 12, 8))
    for t in range(4):
        h_new = cell.apply(cell_params, x[:, t], carry)
        carry = carry * 0.75 + h_new * 0.25
    np.testing.assert_allclose(np.asarray(final), np.asarray(carry),
                               rtol=1e-5, atol=1e-6)


def test_bigru_concat_order():
    model = BiConvGRU(filters=4, zoneout=0.75)
    x = jnp.asarray(np.random.default_rng(2).normal(0, 1, (2, 4, 10, 10, 3)),
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    final, steps = model.apply(params, x)
    assert final.shape == (2, 10, 10, 8)
    assert steps.shape == (2, 4, 10, 10, 8)


def test_standardize_kernel_moments():
    k = np.random.default_rng(3).normal(2.0, 3.0, (3, 3, 7, 16)) \
        .astype(np.float32)
    s = np.asarray(standardize_kernel(jnp.asarray(k)))
    np.testing.assert_allclose(s.mean(axis=(0, 1, 2)), 0.0, atol=1e-6)
    np.testing.assert_allclose(s.std(axis=(0, 1, 2)), 1.0, atol=1e-3)


def test_partial_conv_ratio_border():
    r = np.asarray(partial_conv_ratio(10, 10, 3))[0, ..., 0]
    assert r[5, 5] == pytest.approx(1.0)
    assert r[0, 0] == pytest.approx(9 / 4)
    assert r[0, 5] == pytest.approx(9 / 6)


def test_partial_conv_applies_border_ratio():
    """PartialWSConv must equal the raw WSConv scaled by the ones-conv
    ratio: interior untouched, borders multiplied by k^2/valid-taps."""
    from ttc.models.layers import WSConv

    x = jnp.asarray(
        np.random.default_rng(7).normal(0, 1, (1, 16, 16, 3)), jnp.float32)
    model = PartialWSConv(features=4, padding="SAME")
    params = model.init(jax.random.PRNGKey(0), x)
    out = np.asarray(model.apply(params, x))

    raw = np.asarray(WSConv(features=4, padding="SAME").apply(
        {"params": params["params"]["ws"]}, x))
    ratio = np.asarray(partial_conv_ratio(16, 16, 3))[0, ..., 0]
    np.testing.assert_allclose(out[0], raw[0] * ratio[..., None],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out[0, 8, 8], raw[0, 8, 8], rtol=1e-5)


def test_group_norm_weighted_reduces_to_plain():
    gn = GroupNorm(groups=8)
    x = jnp.asarray(np.random.default_rng(4).normal(0, 1, (2, 8, 8, 16)),
                    jnp.float32)
    params = gn.init(jax.random.PRNGKey(0), x)
    plain = gn.apply(params, x)
    weighted = gn.apply(params, x, weight=jnp.ones_like(x))
    np.testing.assert_allclose(np.asarray(plain), np.asarray(weighted),
                               rtol=1e-5, atol=1e-6)


def test_group_norm_normalizes():
    gn = GroupNorm(groups=4)
    x = jnp.asarray(np.random.default_rng(5).normal(5, 3, (1, 16, 16, 8)),
                    jnp.float32)
    params = gn.init(jax.random.PRNGKey(0), x)
    out = np.asarray(gn.apply(params, x))
    grouped = out.reshape(1, 16, 16, 4, 2)
    np.testing.assert_allclose(grouped.mean(axis=(1, 2, 4)), 0.0, atol=1e-4)
    np.testing.assert_allclose(grouped.std(axis=(1, 2, 4)), 1.0, atol=1e-3)


def test_dropblock_mask_stats():
    rng = jax.random.PRNGKey(0)
    mask = np.asarray(dropblock_mask(rng, (4, 32, 32, 8), 0.7, 5))
    assert set(np.unique(mask)).issubset({0.0, 1.0})
    # roughly keep_prob fraction kept (loose bound)
    assert 0.45 < mask.mean() < 0.95
    out = apply_dropblock(jnp.ones((4, 32, 32, 8)), jnp.asarray(mask))
    np.testing.assert_allclose(float(jnp.mean(out)), 1.0, rtol=1e-3)


def test_unet_train_mode_runs():
    model = TreeCoverNet()
    x = jnp.zeros((2, 5, 28, 28, 17))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(
        params, x, deterministic=False, keep_rate=0.7,
        rngs={"dropblock": jax.random.PRNGKey(1),
              "zoneout": jax.random.PRNGKey(2)})
    assert out.shape == (2, 14, 14)


def test_unet_deterministic_reproducible():
    model = TreeCoverNet()
    x = jnp.asarray(np.random.default_rng(6).normal(0, 1, (1, 5, 28, 28, 17)),
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    a = model.apply(params, x)
    b = model.apply(params, x)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
