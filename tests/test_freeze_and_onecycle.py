"""freeze_bn / freeze_backbone semantics and OneCycle optimizer integration."""

import flax.traverse_util as tu
import jax
import jax.numpy as jnp
import numpy as np

from segtpu.core import create_train_state, make_optimizer, make_train_step
from segtpu.losses import cross_entropy
from segtpu.models import get_model

NC = 5


def _batch(rng, b=2, hw=32):
    imgs = rng.normal(size=(b, hw, hw, 3)).astype(np.float32)
    labels = rng.integers(0, NC, size=(b, hw, hw)).astype(np.int32)
    return jnp.asarray(imgs), jnp.asarray(labels)


def test_freeze_bn_keeps_running_stats():
    model = get_model("UNet", num_classes=NC, freeze_bn=True)
    tx = make_optimizer(lr=0.01, num_epochs=1, iters_per_epoch=10)
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3)))
    step = make_train_step(model, cross_entropy, NC, compute_dtype=jnp.float32)
    rng = np.random.default_rng(0)
    imgs, labels = _batch(rng)
    bs0 = jax.tree_util.tree_map(np.asarray, state.batch_stats)
    state, loss, _ = step(state, imgs, labels, jax.random.PRNGKey(1))
    bs1 = jax.tree_util.tree_map(np.asarray, state.batch_stats)
    for (k, a), (_, b) in zip(tu.flatten_dict(bs0).items(),
                              tu.flatten_dict(bs1).items()):
        np.testing.assert_array_equal(a, b, err_msg=str(k))
    # params still train
    assert np.isfinite(float(loss))


def test_unfrozen_bn_updates_running_stats():
    model = get_model("UNet", num_classes=NC, freeze_bn=False)
    tx = make_optimizer(lr=0.01, num_epochs=1, iters_per_epoch=10)
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3)))
    step = make_train_step(model, cross_entropy, NC, compute_dtype=jnp.float32)
    rng = np.random.default_rng(0)
    imgs, labels = _batch(rng)
    bs0 = tu.flatten_dict(jax.tree_util.tree_map(np.asarray, state.batch_stats))
    state, _, _ = step(state, imgs, labels, jax.random.PRNGKey(1))
    bs1 = tu.flatten_dict(jax.tree_util.tree_map(np.asarray, state.batch_stats))
    assert any(not np.array_equal(bs0[k], bs1[k]) for k in bs0)


def test_freeze_backbone_zeroes_backbone_updates():
    model = get_model("PSPNet", num_classes=NC, backbone="resnet18",
                      use_aux=False)
    tx = make_optimizer(lr=0.1, freeze_backbone=True, num_epochs=1,
                        iters_per_epoch=10)
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3)))
    step = make_train_step(model, cross_entropy, NC, compute_dtype=jnp.float32)
    rng = np.random.default_rng(1)
    imgs, labels = _batch(rng)
    p0 = tu.flatten_dict(jax.tree_util.tree_map(np.asarray, state.params))
    state, _, _ = step(state, imgs, labels, jax.random.PRNGKey(1))
    p1 = tu.flatten_dict(jax.tree_util.tree_map(np.asarray, state.params))
    for k in p0:
        if k[0] == "backbone":
            np.testing.assert_array_equal(p0[k], p1[k], err_msg=str(k))
    assert any(k[0] != "backbone" and not np.array_equal(p0[k], p1[k])
               for k in p0)


def test_onecycle_optimizer_trains():
    model = get_model("UNet", num_classes=NC)
    tx = make_optimizer(optimizer_type="SGD", lr=0.05,
                        scheduler_type="OneCycle", num_epochs=1,
                        iters_per_epoch=20)
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3)))
    step = make_train_step(model, cross_entropy, NC, compute_dtype=jnp.float32)
    rng = np.random.default_rng(2)
    imgs, labels = _batch(rng, b=4)
    losses = []
    for i in range(10):
        state, loss, _ = step(state, imgs, labels, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]
