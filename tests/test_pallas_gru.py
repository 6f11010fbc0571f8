"""Fused Pallas ConvGRU vs the reference-semantics flax cell
(interpret mode on CPU; bf16 tolerance)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ttc.models.convgru import ConvGRUCell, ZoneoutConvGRU
from ttc.ops.pallas_gru import (
    fused_convgru_step,
    fused_zoneout_gru,
    params_from_cell,
)


@pytest.fixture(scope="module")
def cell_setup():
    f, cx, hw = 32, 17, 40
    cell = ConvGRUCell(filters=f)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 0.5, (2, hw, hw, cx)), jnp.float32)
    h = jnp.asarray(rng.normal(0, 0.5, (2, hw, hw, f)), jnp.float32)
    params = cell.init(jax.random.PRNGKey(0), x, h)
    return cell, params, x, h


def test_fused_step_matches_cell(cell_setup):
    cell, params, x, h = cell_setup
    ref = np.asarray(cell.apply(params, x, h))

    fused_p = params_from_cell(params["params"])
    xh = jnp.concatenate([x, h], axis=-1).astype(jnp.bfloat16)
    xh_pad = jnp.pad(xh, ((0, 0), (1, 1), (1, 1), (0, 0)),
                     mode="reflect")
    got = np.asarray(fused_convgru_step(xh_pad, fused_p,
                                        interpret=True),
                     dtype=np.float32)
    # bf16 activations: tolerance at the bf16 resolution of ~tanh range
    assert np.abs(got - ref).max() < 0.03
    assert np.abs(got - ref).mean() < 0.005


def test_fused_sequence_matches_zoneout_gru(cell_setup):
    cell, params, x, h = cell_setup
    del cell, h
    f, hw = 32, 40
    seq = jnp.stack([x, x * 0.8, x * 1.1, x * 0.9], axis=1)

    model = ZoneoutConvGRU(filters=f, zoneout=0.75)
    mp = {"params": {"cell": params["params"]}}
    ref_out, ref_final = model.apply(mp, seq)

    fused_p = params_from_cell(params["params"])
    h0 = jnp.zeros((2, hw, hw, f), jnp.float32)
    got_out, got_final = fused_zoneout_gru(seq, h0, fused_p,
                                           interpret=True)
    assert np.abs(np.asarray(got_final)
                  - np.asarray(ref_final)).mean() < 0.01
    assert np.abs(np.asarray(got_out)
                  - np.asarray(ref_out)).mean() < 0.01


def test_fused_im2col_matches_cell(cell_setup):
    from ttc.ops.pallas_gru import fused_convgru_step_im2col

    cell, params, x, h = cell_setup
    ref = np.asarray(cell.apply(params, x, h))
    fused_p = params_from_cell(params["params"])
    xh = jnp.concatenate([x, h], axis=-1).astype(jnp.bfloat16)
    xh_pad = jnp.pad(xh, ((0, 0), (1, 1), (1, 1), (0, 0)),
                     mode="reflect")
    got = np.asarray(fused_convgru_step_im2col(xh_pad, fused_p,
                                               interpret=True),
                     dtype=np.float32)
    assert np.abs(got - ref).max() < 0.03
