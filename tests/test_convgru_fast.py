"""The grouped-conv direction-stacked BiConvGRU must be numerically
identical to the separate fw/bw implementation given the same weights."""
import jax
import jax.numpy as jnp
import numpy as np

from ttc.models.convgru import BiConvGRU


def _remap_params(sep_params, filters):
    """separate-stream param tree -> shared-stream param tree."""
    cells = {}
    for d in ("fw", "bw"):
        cell = sep_params["params"][d]["cell"]
        cells[f"{d}_gates_kernel"] = cell["gates_kernel"]
        cells[f"{d}_candidate_kernel"] = cell["candidate_kernel"]
        cells[f"{d}_candidate_sse_kernel"] = cell["candidate_sse_kernel"]
    norms = {}
    for name in ("norm_gates_r", "norm_gates_u", "norm_candidate"):
        norms[name] = {
            "gamma": jnp.concatenate(
                [sep_params["params"]["fw"]["cell"][name]["gamma"],
                 sep_params["params"]["bw"]["cell"][name]["gamma"]]),
            "beta": jnp.concatenate(
                [sep_params["params"]["fw"]["cell"][name]["beta"],
                 sep_params["params"]["bw"]["cell"][name]["beta"]]),
        }
    cell_tree = dict(cells)
    cell_tree.update(norms)
    return {"params": {"cells": {"cell": cell_tree}}}


def test_shared_stream_matches_separate():
    f = 32
    x = jnp.asarray(
        np.random.default_rng(0).normal(0, 1, (2, 4, 24, 24, 17)),
        jnp.float32)

    sep = BiConvGRU(filters=f, shared_stream=False)
    sep_params = sep.init(jax.random.PRNGKey(0), x)
    final_sep, steps_sep = sep.apply(sep_params, x)

    shared = BiConvGRU(filters=f, shared_stream=True)
    shared_params = _remap_params(sep_params, f)
    # sanity: shapes line up with a fresh init
    ref_init = jax.tree_util.tree_map(
        lambda a: a.shape, shared.init(jax.random.PRNGKey(1), x))
    got_shapes = jax.tree_util.tree_map(lambda a: a.shape, shared_params)
    assert ref_init == got_shapes

    final_sh, steps_sh = shared.apply(shared_params, x)
    np.testing.assert_allclose(np.asarray(final_sh),
                               np.asarray(final_sep),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(steps_sh),
                               np.asarray(steps_sep),
                               rtol=2e-5, atol=2e-5)
