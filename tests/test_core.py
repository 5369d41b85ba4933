"""Core runtime: jitted DP train step on the 8-device mesh, differential LR,
overfit smoke test."""

import jax
import jax.numpy as jnp
import numpy as np
import flax.traverse_util

from segtpu.core import (
    TrainState, create_train_state, make_mesh, make_optimizer,
    make_train_step, make_eval_step, shard_batch,
)
from segtpu.losses import cross_entropy
from segtpu.metrics import summarize
from segtpu.models import get_model

NC = 5


def _toy_batch(rng, b=8, hw=32):
    imgs = rng.normal(size=(b, hw, hw, 3)).astype(np.float32)
    labels = rng.integers(0, NC, size=(b, hw, hw)).astype(np.int32)
    # structured labels so the task is learnable: class = quadrant
    labels[:, : hw // 2, : hw // 2] = 0
    labels[:, : hw // 2, hw // 2:] = 1
    labels[:, hw // 2:, : hw // 2] = 2
    labels[:, hw // 2:, hw // 2:] = 3
    imgs += labels[..., None].astype(np.float32)
    return imgs, labels


def _small_unet():
    return get_model("UNet", num_classes=NC)


def test_train_step_runs_and_overfits():
    model = _small_unet()
    mesh = make_mesh()
    tx = make_optimizer(lr=0.05, num_epochs=1, iters_per_epoch=50)
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3)))
    step = make_train_step(model, cross_entropy, NC, mesh=mesh,
                           compute_dtype=jnp.float32)
    rng = np.random.default_rng(0)
    imgs, labels = _toy_batch(rng)
    imgs_d, labels_d = shard_batch(mesh, (imgs, labels))
    key = jax.random.PRNGKey(1)

    losses = []
    for _ in range(30):
        state, loss, stats = step(state, imgs_d, labels_d, key)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, losses
    m = summarize(stats)
    assert m["Pixel_Accuracy"] > 0.5


def test_sharded_matches_single_device():
    model = _small_unet()
    mesh = make_mesh()
    tx = make_optimizer(lr=0.01, num_epochs=1, iters_per_epoch=10)
    rng = np.random.default_rng(1)
    imgs, labels = _toy_batch(rng)
    key = jax.random.PRNGKey(2)

    def run(mesh_arg):
        state = create_train_state(model, tx, jax.random.PRNGKey(0),
                                   jnp.zeros((1, 32, 32, 3)))
        step = make_train_step(model, cross_entropy, NC, mesh=mesh_arg,
                               compute_dtype=jnp.float32)
        if mesh_arg is not None:
            b = shard_batch(mesh_arg, (jnp.asarray(imgs), jnp.asarray(labels)))
        else:
            b = (jnp.asarray(imgs), jnp.asarray(labels))
        for _ in range(3):
            state, loss, stats = step(state, b[0], b[1], key)
        return float(loss), state

    loss_sharded, state_sharded = run(mesh)
    loss_single, state_single = run(None)
    assert abs(loss_sharded - loss_single) < 1e-4, (loss_sharded, loss_single)
    # parameters must match: the all-reduced gradient == full-batch gradient
    fs = flax.traverse_util.flatten_dict(state_sharded.params)
    fd = flax.traverse_util.flatten_dict(state_single.params)
    # all-reduce summation order differs from the single-device reduction;
    # tolerance covers fp32 noise over 3 steps, not semantic drift
    for k in fs:
        np.testing.assert_allclose(np.asarray(fs[k]), np.asarray(fd[k]),
                                   rtol=1e-3, atol=5e-4)


def test_differential_lr_scales_backbone_updates():
    model = get_model("PSPNet", num_classes=NC, backbone="resnet18",
                      use_aux=False)
    tx = make_optimizer(lr=0.1, momentum=0.0, weight_decay=0.0,
                        num_epochs=1, iters_per_epoch=10)
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3)))
    step = make_train_step(model, cross_entropy, NC, compute_dtype=jnp.float32)
    rng = np.random.default_rng(2)
    imgs, labels = _toy_batch(rng, b=2, hw=32)
    p0 = jax.tree_util.tree_map(lambda a: np.asarray(a).copy(), state.params)
    state, loss, _ = step(state, jnp.asarray(imgs), jnp.asarray(labels),
                          jax.random.PRNGKey(0))

    # Verify: update == -lr_group * grad with lr_backbone == lr/10.
    # Recompute the raw gradient at p0 with a fresh (no-momentum) state.
    def pick(tree, path):
        out = tree
        for p in path:
            out = out[p]
        return out

    flat0 = flax.traverse_util.flatten_dict(p0)
    flat1 = flax.traverse_util.flatten_dict(
        jax.tree_util.tree_map(np.asarray, state.params))
    # Schedule factor APPLIED at update 0: torch's _LRScheduler consumes
    # T=0 at construction, so the first applied factor is T=1 (schedules.py
    # T=t+1 indexing, pinned by test_training_dynamics_parity).
    poly0 = (1 - 1 / 10) ** 0.9

    bb = [k for k in flat0 if k[0] == "backbone" and np.abs(flat1[k] - flat0[k]).max() > 0]
    dec = [k for k in flat0 if k[0] != "backbone" and np.abs(flat1[k] - flat0[k]).max() > 0]
    assert bb and dec

    # gradient via jax for exact comparison
    def loss_fn(params):
        out = model.apply({"params": params,
                           "batch_stats": state.batch_stats},
                          jnp.asarray(imgs), train=False)
        return cross_entropy(out["out"], jnp.asarray(labels))

    # can't easily recompute identical grads (batch_stats changed) — instead
    # check the RATIO of update magnitude to gradient magnitude per group
    # using the train-mode graph at p0:
    def loss_train(params, bs):
        # the step derives its dropout key as fold_in(rng, state.step) with
        # step=0 — use the identical key so gradients match exactly
        out, _ = model.apply({"params": params, "batch_stats": bs},
                             jnp.asarray(imgs), train=True,
                             rngs={"dropout": jax.random.fold_in(
                                 jax.random.PRNGKey(0), 0)},
                             mutable=["batch_stats"])
        o = out["out"].astype(jnp.float32)
        return cross_entropy(o, jnp.asarray(labels))

    bs0 = jax.tree_util.tree_map(jnp.asarray,
                                 create_train_state(model, tx, jax.random.PRNGKey(0),
                                                    jnp.zeros((1, 32, 32, 3))).batch_stats)
    grads = jax.grad(loss_train)(jax.tree_util.tree_map(jnp.asarray, p0), bs0)
    gflat = flax.traverse_util.flatten_dict(
        jax.tree_util.tree_map(np.asarray, grads))

    k_bb = max(bb, key=lambda k: np.abs(gflat[k]).max())
    k_dec = max(dec, key=lambda k: np.abs(gflat[k]).max())
    upd_bb = flat1[k_bb] - flat0[k_bb]
    upd_dec = flat1[k_dec] - flat0[k_dec]
    lr_eff_bb = -(upd_bb.ravel() @ gflat[k_bb].ravel()) / (
        gflat[k_bb].ravel() @ gflat[k_bb].ravel())
    lr_eff_dec = -(upd_dec.ravel() @ gflat[k_dec].ravel()) / (
        gflat[k_dec].ravel() @ gflat[k_dec].ravel())
    np.testing.assert_allclose(lr_eff_dec, 0.1 * poly0, rtol=0.05)
    np.testing.assert_allclose(lr_eff_bb, 0.01 * poly0, rtol=0.05)


def test_eval_step():
    model = _small_unet()
    mesh = make_mesh()
    tx = make_optimizer(lr=0.01, num_epochs=1, iters_per_epoch=10)
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3)))
    estep = make_eval_step(model, cross_entropy, NC, mesh=mesh,
                           compute_dtype=jnp.float32)
    rng = np.random.default_rng(3)
    imgs, labels = _toy_batch(rng)
    imgs_d, labels_d = shard_batch(mesh, (imgs, labels))
    loss, stats = estep(state, imgs_d, labels_d)
    assert np.isfinite(float(loss))
    m = summarize(stats)
    assert 0.0 <= m["Mean_IoU"] <= 1.0


def test_remat_matches_no_remat():
    """jax.checkpoint must not change the math — only the memory schedule."""
    model = _small_unet()
    tx = make_optimizer(lr=0.01, num_epochs=1, iters_per_epoch=10)
    rng = np.random.default_rng(7)
    imgs, labels = _toy_batch(rng, b=2, hw=32)
    key = jax.random.PRNGKey(3)

    def run(remat):
        state = create_train_state(model, tx, jax.random.PRNGKey(0),
                                   jnp.zeros((1, 32, 32, 3)))
        step = make_train_step(model, cross_entropy, NC, remat=remat,
                               compute_dtype=jnp.float32)
        state, loss, stats = step(state, jnp.asarray(imgs),
                                  jnp.asarray(labels), key)
        return float(loss), jax.tree_util.tree_map(np.asarray, state.params)

    l1, p1 = run(False)
    l2, p2 = run(True)
    assert abs(l1 - l2) < 1e-6
    import flax.traverse_util as tu
    f1, f2 = tu.flatten_dict(p1), tu.flatten_dict(p2)
    for k in f1:
        np.testing.assert_allclose(f1[k], f2[k], rtol=1e-5, atol=1e-6)


def test_spatial_partitioning_matches_unsharded():
    """H sharded over the model axis (GSPMD spatial partitioning with halo
    exchange) must reproduce the unsharded result — the TPU-native analog of
    the reference's spatial tiling (SURVEY.md §5.7)."""
    model = _small_unet()
    mesh = make_mesh(model_parallel=4)  # 2 data x 4 model
    tx = make_optimizer(lr=0.01, num_epochs=1, iters_per_epoch=10)
    rng = np.random.default_rng(11)
    imgs, labels = _toy_batch(rng, b=2, hw=64)
    key = jax.random.PRNGKey(5)

    def run(mesh_arg, spatial):
        state = create_train_state(model, tx, jax.random.PRNGKey(0),
                                   jnp.zeros((1, 64, 64, 3)))
        step = make_train_step(model, cross_entropy, NC, mesh=mesh_arg,
                               spatial=spatial, compute_dtype=jnp.float32)
        b = (jnp.asarray(imgs), jnp.asarray(labels))
        if mesh_arg is not None:
            from segtpu.core.mesh import batch_sharding
            sh = batch_sharding(mesh_arg, spatial=spatial)
            b = tuple(jax.device_put(x, sh) for x in b)
        state, loss, stats = step(state, b[0], b[1], key)
        return float(loss), np.asarray(stats.inter)

    loss_sp, inter_sp = run(mesh, True)
    loss_ref, inter_ref = run(None, False)
    assert abs(loss_sp - loss_ref) < 1e-4, (loss_sp, loss_ref)
    np.testing.assert_allclose(inter_sp, inter_ref, rtol=1e-4, atol=1)


def test_tensor_parallel_matches_replicated():
    """Conv kernels channel-sharded over the model axis (tp_sharding_tree +
    state_sharding on the step) must reproduce the replicated result —
    Megatron-style column parallelism for convs via GSPMD alone."""
    from segtpu.core import shard_state, tp_sharding_tree
    from segtpu.core.mesh import MODEL_AXIS

    model = _small_unet()
    mesh = make_mesh(devices=jax.devices()[:2], model_parallel=2)  # pure TP
    tx = make_optimizer(lr=0.01, num_epochs=1, iters_per_epoch=10)
    rng = np.random.default_rng(12)
    imgs, labels = _toy_batch(rng, b=2, hw=32)
    key = jax.random.PRNGKey(5)

    def run(tp):
        state = create_train_state(model, tx, jax.random.PRNGKey(0),
                                   jnp.zeros((1, 32, 32, 3)))
        tree = tp_sharding_tree(mesh, state, min_channels=128) if tp else None
        state = shard_state(mesh, state, tree)
        if tp:
            # at least one kernel must actually be sharded over MODEL_AXIS
            specs = [s.spec for s in jax.tree_util.tree_leaves(tree)]
            assert any(MODEL_AXIS in (p or ()) for sp in specs
                       for p in sp), specs
        step = make_train_step(model, cross_entropy, NC, mesh=mesh,
                               compute_dtype=jnp.float32,
                               state_sharding=tree)
        b = shard_batch(mesh, (imgs, labels))
        state, loss, stats = step(state, b[0], b[1], key)
        # eval keeps the TP layout too (no all-gather of the state)
        estep = make_eval_step(model, cross_entropy, NC, mesh=mesh,
                               compute_dtype=jnp.float32,
                               state_sharding=tree)
        eloss, _ = estep(state, b[0], b[1])
        return float(loss), float(eloss), np.asarray(stats.inter)

    loss_tp, eloss_tp, inter_tp = run(True)
    loss_rep, eloss_rep, inter_rep = run(False)
    assert abs(loss_tp - loss_rep) < 1e-4, (loss_tp, loss_rep)
    assert abs(eloss_tp - eloss_rep) < 1e-4, (eloss_tp, eloss_rep)
    np.testing.assert_allclose(inter_tp, inter_rep, rtol=1e-4, atol=1)
