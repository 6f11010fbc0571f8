"""Numerics gate for the Pallas epilogue ConvGRU path.

The epilogue kernels (ttc/ops/pallas_epilogue.py) are an experimental
inference path (measured slower than XLA on v5e — see the module
STATUS note — but kept as the documented measurement of the "epilogue
fusion" lever). This gate pins that the path stays numerically honest:
interpret-mode kernels on CPU must match the flax bf16 cell within
bf16 tolerance for both per-step outputs and the zoneout-blended
final state.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ttc.models.convgru import ZoneoutConvGRU


@pytest.mark.slow
def test_epilogue_matches_flax_bf16():
    rng = np.random.default_rng(0)
    x = (rng.random((2, 4, 24, 24, 17)).astype(np.float32) - 0.5)
    m_ref = ZoneoutConvGRU(8, dtype=jnp.bfloat16)
    params = m_ref.init(jax.random.PRNGKey(1), x)
    steps_a, fin_a = m_ref.apply(params, x)
    m_epi = ZoneoutConvGRU(8, dtype=jnp.bfloat16, epilogue=True)
    steps_b, fin_b = m_epi.apply(params, x)

    da = np.abs(np.asarray(steps_a, np.float32)
                - np.asarray(steps_b, np.float32))
    df = np.abs(np.asarray(fin_a, np.float32)
                - np.asarray(fin_b, np.float32))
    assert da.max() < 0.03, da.max()
    assert df.max() < 0.03, df.max()


def test_epilogue_inert_at_init_and_training():
    """epilogue=True must not change the param tree (init falls back
    to the flax path) nor fire in non-deterministic mode."""
    rng = np.random.default_rng(0)
    x = (rng.random((1, 4, 16, 16, 17)).astype(np.float32) - 0.5)
    p_ref = ZoneoutConvGRU(8, dtype=jnp.bfloat16).init(
        jax.random.PRNGKey(1), x)
    p_epi = ZoneoutConvGRU(8, dtype=jnp.bfloat16, epilogue=True).init(
        jax.random.PRNGKey(1), x)
    assert jax.tree_util.tree_structure(p_ref) \
        == jax.tree_util.tree_structure(p_epi)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_epi)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
