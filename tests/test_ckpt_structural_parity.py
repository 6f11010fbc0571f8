"""Structural parity of TreeCoverNet vs the reference release checkpoint.

The reference ships ``models-release/master-ckpt-nonfrozen`` with only
the ``.index``/``.meta`` files (the ``.data`` values shard is absent
from the snapshot), so exact value import is impossible — but the index
records every variable's name and shape. This test asserts a complete
1:1 mapping between the flax TreeCoverNet parameter pytree and the
checkpoint's model variables, catching any wiring drift (wrong channel
counts, missing blocks, extra parameters) that pure shape tests can't.

Reference: variable scopes created in src/train/train-model.py:110-231
and src/train/src/model.py (conv_swish_gn :448-538, ConvGRUCell
:208-292); checkpoint saved by tf.train.Saver (train-model.py:290-323).

The variable list is frozen in tests/fixtures/master_ckpt_vars.json
(recorded from the real checkpoint via tf.train.list_variables); when
the reference checkpoint and tensorflow are both available, a slow test
re-verifies the fixture against the live index.
"""
import json
import os

import jax
import jax.numpy as jnp
import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "master_ckpt_vars.json")
REF_CKPT = "/root/reference/models-release/master-ckpt-nonfrozen/-0"

# flax module name -> (TF conv scope, ws_conv2d suffix index, has partial
# conv mask). The reference numbers WSConv2D layers globally in creation
# order; partial-conv mask kernels exist only for SAME-padded blocks
# (reference: src/train/src/model.py:396-444 partial_conv wraps the mask
# conv; VALID blocks call WSConv2D directly).
CONV_BLOCKS = {
    "conv_median": ("conv_median", 0, True),
    "conv_concat": ("conv_concat", 1, True),
    "conv1": ("conv1", 2, False),
    "conv2": ("conv2", 3, False),
    "up2": ("up2", 4, True),
    "up2_out": ("up2_out", 5, True),
    "up3": ("up3", 6, True),
    "out": ("out", 7, False),
}

# TF variables that have no flax-parameter counterpart, by design:
#   - partial-conv mask kernels are constant all-ones (flax computes the
#     mask ratio with a fixed kernel, not a variable)
#   - optimizer bookkeeping (AdaBound non-slot vars, global steps)
NON_PARAM_TF_VARS = {
    "beta1_power", "beta2_power", "gamma_multi",
    "global_step", "global_step_1", "global_step_2",
} | {
    f"{name}_conv/{name}/mask/conv2d/kernel"
    for name, (_, _, has_mask) in CONV_BLOCKS.items() if has_mask
}


def expected_tf_name(path_parts):
    """Map one flax param path (tuple of str keys) to its TF name."""
    top = path_parts[0]
    if top == "fm":
        return f"conv2d_5/{path_parts[1]}"
    if top == "gru":
        d = path_parts[1]  # fw | bw
        base = f"down_16/bidirectional_rnn/{d}/conv_gru_cell"
        leaf = path_parts[3]
        if leaf == "gates_kernel":
            return f"{base}/gates/kernel"
        if leaf == "candidate_kernel":
            return f"{base}/candidate/kernel"
        if leaf == "candidate_sse_kernel":
            return f"{base}/candidate/kernel_1"
        # group norms live inside the while-loop scope
        gate = {"norm_gates_r": "gates_r", "norm_gates_u": "gates_u",
                "norm_candidate": "candidate_y"}[leaf]
        sub = "gates" if gate.startswith("gates") else "candidate"
        gb = path_parts[4]  # gamma | beta
        return (f"down_16/bidirectional_rnn/{d}/{d}/while/{d}/"
                f"conv_gru_cell/{sub}/{gate}_norm/{gb}_{gate}")
    scope, idx, _ = CONV_BLOCKS[top]
    kind = path_parts[1]
    if kind == "conv":
        suffix = f"ws_conv2d_{idx}" if idx else "ws_conv2d"
        inner = "x/" if CONV_BLOCKS[top][2] else ""
        return f"{scope}_conv/{scope}/{inner}{suffix}/kernel"
    if kind == "csse":
        return f"csse_{scope}_conv/{path_parts[3]}"
    if kind == "norm":
        return f"{scope}_norm/{path_parts[2]}_{scope}"
    raise KeyError(path_parts)


def flax_param_paths():
    from ttc.models.unet import TreeCoverNet

    model = TreeCoverNet()
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 5, 28, 28, 17), jnp.float32))
    flat = jax.tree_util.tree_flatten_with_path(shapes)[0]
    out = {}
    for path, leaf in flat:
        keys = tuple(k.key for k in path)
        assert keys[0] == "params"
        out[keys[1:]] = tuple(leaf.shape)
    return out


def test_complete_structural_mapping():
    with open(FIXTURE) as f:
        tf_vars = json.load(f)
    model_vars = {n: tuple(s) for n, s in tf_vars.items()
                  if "/AdaBound" not in n}

    flax = flax_param_paths()
    mapped = set()
    for path, shape in flax.items():
        tf_name = expected_tf_name(path)
        assert tf_name in model_vars, (
            f"flax param {path} expects TF var {tf_name!r} — absent")
        tf_shape = model_vars[tf_name]
        # TF stores scalars/vectors identically; conv kernels are HWIO
        # in both frameworks, so shapes must match exactly.
        assert tuple(tf_shape) == shape, (
            f"{path} -> {tf_name}: flax {shape} vs ckpt {tf_shape}")
        mapped.add(tf_name)

    # every checkpoint model variable is either mapped or a known
    # non-parameter (constant mask kernel / optimizer bookkeeping)
    leftovers = set(model_vars) - mapped - NON_PARAM_TF_VARS
    assert not leftovers, f"unaccounted checkpoint vars: {leftovers}"
    assert len(mapped) == len(flax) == 60


def test_optimizer_slots_cover_every_kernel():
    """Every trainable variable has 3 AdaBound slots in the checkpoint
    (m, v, v-hat), confirming the released checkpoint was trained with
    the same AdaBound configuration the rebuild replicates
    (ttc/train/optim.py; reference src/layers/adabound.py:88-91)."""
    with open(FIXTURE) as f:
        tf_vars = json.load(f)
    trainable = [n for n in tf_vars
                 if "/AdaBound" not in n and n not in NON_PARAM_TF_VARS]
    for n in trainable:
        for slot in ("AdaBound", "AdaBound_1", "AdaBound_2"):
            assert f"{n}/{slot}" in tf_vars, f"missing {slot} for {n}"


@pytest.mark.slow
def test_fixture_matches_live_checkpoint():
    if not os.path.exists(REF_CKPT + ".index"):
        pytest.skip("reference checkpoint not available")
    tf = pytest.importorskip("tensorflow")
    live = {n: list(s) for n, s in tf.train.list_variables(REF_CKPT)}
    with open(FIXTURE) as f:
        recorded = json.load(f)
    assert live == recorded
