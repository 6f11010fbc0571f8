"""Training stack: losses vs reference, optimizers, sharded step."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.reference_harness import load_reference_fns, reference_available
from ttc.models.losses import (
    boundary_dist_map,
    calc_cosine_decay,
    tree_cover_loss,
    weighted_bce,
)
from ttc.train.data import augment_batch, equibatch
from ttc.train.optim import adabound, sam_gradient, swa_init, swa_update


@pytest.mark.skipif(not reference_available(), reason="no reference")
def test_boundary_dist_map_matches_reference():
    fns = load_reference_fns("src/train/src/losses.py", ["calc_dist_map"])
    ref_fn = fns["calc_dist_map"]
    rng = np.random.default_rng(0)
    for p in (0.1, 0.3, 0.6):
        for seed in range(4):
            seg = (np.random.default_rng(seed).random((14, 14)) < p) \
                .astype(np.float32)
            ref = ref_fn(seg.copy())
            got = np.asarray(boundary_dist_map(jnp.asarray(seg)))
            np.testing.assert_allclose(got, ref, atol=1e-5,
                                       err_msg=f"p={p} seed={seed}")
    del rng


@pytest.mark.skipif(not reference_available(), reason="no reference")
def test_boundary_dist_map_edge_cases():
    fns = load_reference_fns("src/train/src/losses.py", ["calc_dist_map"])
    for seg in (np.zeros((14, 14), np.float32),
                np.ones((14, 14), np.float32)):
        ref = fns["calc_dist_map"](seg.copy())
        got = np.asarray(boundary_dist_map(jnp.asarray(seg)))
        np.testing.assert_allclose(got, ref)


def test_weighted_bce_matches_tf_formula():
    rng = np.random.default_rng(1)
    y = rng.random((2, 14, 14)).astype(np.float32)
    p = rng.random((2, 14, 14)).astype(np.float32)
    got = np.asarray(weighted_bce(jnp.asarray(y), jnp.asarray(p)))
    # manual: clip, logits, weighted CE with w=1 reduces to plain CE
    yc = np.clip(y, 0.0125, 1 - 0.045)
    pc = np.clip(p, 1e-7, 1 - 1e-7)
    x = np.log(pc / (1 - pc))
    ref = (1 - yc) * x + np.log1p(np.exp(-x))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_cosine_decay_endpoints():
    assert calc_cosine_decay(0, 75, 0) == pytest.approx(1.0)
    assert calc_cosine_decay(75, 75, 0) == pytest.approx(0.0)


def test_tree_cover_loss_finite():
    rng = np.random.default_rng(2)
    y = (rng.random((4, 14, 14)) > 0.5).astype(np.float32)
    p = rng.random((4, 14, 14)).astype(np.float32)
    loss = float(tree_cover_loss(jnp.asarray(y), jnp.asarray(p), 0.2))
    assert np.isfinite(loss)


def test_adabound_bounds_and_descent():
    opt = adabound(1e-3, final_lr=0.1)
    params = {"w": jnp.ones((4, 4))}
    state = opt.init(params)
    grads = {"w": jnp.full((4, 4), 0.5)}
    updates, state = opt.update(grads, state, params)
    # all updates negative (descent direction), bounded magnitude
    u = np.asarray(updates["w"])
    assert np.all(u < 0)
    assert np.all(np.abs(u) < 0.2)


def test_sam_gradient_differs_from_plain():
    def loss_fn(p):
        return jnp.sum(jnp.sin(p["w"]) ** 2) + 0.1 * jnp.sum(p["w"] ** 4)

    params = {"w": jnp.asarray(np.random.default_rng(3).normal(
        0, 1, (8,)), jnp.float32)}
    loss, sam_g = sam_gradient(loss_fn, params, rho=0.5)
    plain_g = jax.grad(loss_fn)(params)
    assert not np.allclose(np.asarray(sam_g["w"]),
                           np.asarray(plain_g["w"]))
    assert np.isfinite(loss)


def test_swa_running_average():
    p0 = {"w": jnp.zeros(3)}
    s = swa_init(p0)
    s = swa_update(s, {"w": jnp.ones(3) * 2})
    s = swa_update(s, {"w": jnp.ones(3) * 4})
    np.testing.assert_allclose(np.asarray(s.average["w"]), 3.0)


def test_equibatch_mix():
    rng = np.random.default_rng(4)
    n = 220
    train_y = rng.random((n, 14, 14)) * rng.choice(
        [0, 0.1, 0.5, 1.0], (n, 1, 1))
    ids = equibatch(list(range(n)), train_y, rng)
    assert len(ids) > 0 and len(ids) % 11 == 0
    # every group of 11 contains >= 3 low-density samples
    sums = np.array([train_y[i].sum() for i in ids[:11]])
    assert np.sum(sums <= 2) >= 3


def test_augment_batch_shapes():
    rng = np.random.default_rng(5)
    train_x = rng.random((8, 12, 28, 28, 17)).astype(np.float32)
    train_y = rng.random((8, 14, 14)).astype(np.float32)
    xb, yb = augment_batch([0, 1, 2, 3], train_x, train_y, rng=rng)
    assert xb.shape == (4, 5, 28, 28, 17)
    assert yb.shape == (4, 14, 14)
    assert np.isfinite(xb).all()


@pytest.mark.slow
def test_dryrun_multichip_cpu():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
