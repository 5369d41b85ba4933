"""Loss tests against torch ground truth (same semantics as the reference)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from segtpu import losses


def make_batch(rng, b=2, h=8, w=8, c=5, ignore_index=255, ignore_frac=0.2):
    logits = rng.standard_normal((b, h, w, c)).astype(np.float32)
    target = rng.integers(0, c, size=(b, h, w)).astype(np.int64)
    mask = rng.random((b, h, w)) < ignore_frac
    target[mask] = ignore_index
    return logits, target


def torch_ce(logits, target, ignore_index=255, weight=None):
    lg = torch.from_numpy(np.transpose(logits, (0, 3, 1, 2)))
    w = torch.from_numpy(weight) if weight is not None else None
    return F.cross_entropy(lg, torch.from_numpy(target),
                           ignore_index=ignore_index, weight=w).item()


def test_cross_entropy_matches_torch(rng):
    logits, target = make_batch(rng)
    got = float(losses.cross_entropy(jnp.asarray(logits), jnp.asarray(target)))
    assert got == pytest.approx(torch_ce(logits, target), rel=1e-5)


def test_cross_entropy_weighted(rng):
    logits, target = make_batch(rng)
    w = rng.random(5).astype(np.float32) + 0.5
    got = float(losses.cross_entropy(jnp.asarray(logits), jnp.asarray(target),
                                     weight=jnp.asarray(w)))
    assert got == pytest.approx(torch_ce(logits, target, weight=w), rel=1e-5)


def test_cross_entropy_negative_ignore(rng):
    """ADE20K uses ignore_index=-1 (reference dataloaders/ade20k.py:35)."""
    logits, target = make_batch(rng, ignore_index=-1)
    got = float(losses.cross_entropy(jnp.asarray(logits), jnp.asarray(target),
                                     ignore_index=-1))
    assert got == pytest.approx(torch_ce(logits, target, ignore_index=-1), rel=1e-5)


def test_focal_matches_reference_semantics(rng):
    """Reference FocalLoss means over ALL pixels (ignored contribute 0)."""
    logits, target = make_batch(rng)
    lg = torch.from_numpy(np.transpose(logits, (0, 3, 1, 2)))
    ce = F.cross_entropy(lg, torch.from_numpy(target), ignore_index=255,
                         reduction="none")
    ref = (((1 - torch.exp(-ce)) ** 2) * ce).mean().item()
    got = float(losses.focal_loss(jnp.asarray(logits), jnp.asarray(target)))
    assert got == pytest.approx(ref, rel=1e-5)


def test_dice_no_ignore_matches_reference(rng):
    """Without ignored pixels our dice equals the reference formula exactly."""
    logits, target = make_batch(rng, ignore_frac=0.0)
    lg = torch.from_numpy(np.transpose(logits, (0, 3, 1, 2)))
    tg = torch.from_numpy(target)
    onehot = F.one_hot(tg, 5).permute(0, 3, 1, 2).float()
    probs = F.softmax(lg, dim=1)
    inter = (probs.reshape(-1) * onehot.reshape(-1)).sum()
    ref = (1 - (2 * inter + 1.0) / (probs.sum() + onehot.sum() + 1.0)).item()
    got = float(losses.dice_loss(jnp.asarray(logits), jnp.asarray(target)))
    assert got == pytest.approx(ref, rel=1e-5)


def test_dice_ignores_masked_pixels(rng):
    logits, target = make_batch(rng, ignore_frac=0.3)
    base = float(losses.dice_loss(jnp.asarray(logits), jnp.asarray(target)))
    # Scrambling logits at ignored pixels must not change the loss.
    scrambled = logits + 100.0 * (target == 255)[..., None].astype(np.float32)
    after = float(losses.dice_loss(jnp.asarray(scrambled), jnp.asarray(target)))
    assert after == pytest.approx(base, rel=1e-4)


def _lovasz_reference(probs, labels, ignore=255):
    """Straight numpy transcription of the Lovász-Softmax definition
    (present classes, flattened batch) used as ground truth."""
    c = probs.shape[-1]
    probs = probs.reshape(-1, c)
    labels = labels.reshape(-1)
    keep = labels != ignore
    probs, labels = probs[keep], labels[keep]
    loss, n_present = 0.0, 0
    for cls in range(c):
        fg = (labels == cls).astype(np.float64)
        if fg.sum() == 0:
            continue
        n_present += 1
        errors = np.abs(fg - probs[:, cls])
        order = np.argsort(-errors, kind="stable")
        fg_sorted = fg[order]
        gts = fg_sorted.sum()
        inter = gts - np.cumsum(fg_sorted)
        union = gts + np.cumsum(1.0 - fg_sorted)
        jacc = 1.0 - inter / union
        jacc[1:] = jacc[1:] - jacc[:-1]
        loss += np.dot(errors[order], jacc)
    return loss / max(n_present, 1)


def test_lovasz_matches_definition(rng):
    logits, target = make_batch(rng, b=1, h=6, w=6, c=4)
    probs = np.asarray(jnp.asarray(logits))
    probs = np.exp(probs) / np.exp(probs).sum(-1, keepdims=True)
    ref = _lovasz_reference(probs, target)
    got = float(losses.lovasz_softmax(jnp.asarray(logits), jnp.asarray(target)))
    assert got == pytest.approx(ref, rel=1e-4, abs=1e-5)


def test_ce_dice_is_sum(rng):
    logits, target = make_batch(rng)
    lj, tj = jnp.asarray(logits), jnp.asarray(target)
    got = float(losses.ce_dice_loss(lj, tj))
    expect = float(losses.cross_entropy(lj, tj)) + float(losses.dice_loss(lj, tj))
    assert got == pytest.approx(expect, rel=1e-6)


def test_registry_names():
    for name in ["CrossEntropyLoss2d", "DiceLoss", "FocalLoss", "CE_DiceLoss",
                 "LovaszSoftmax"]:
        assert callable(losses.get_loss(name))


def _np_lovasz_hinge_flat(logits, labels):
    """Reference lovasz_hinge_flat in numpy (utils/lovasz_losses.py:94-109)."""
    if len(labels) == 0:
        return 0.0
    signs = 2.0 * labels - 1.0
    errors = 1.0 - logits * signs
    order = np.argsort(-errors, kind="stable")
    errors_sorted = errors[order]
    gt_sorted = labels[order]
    gts = gt_sorted.sum()
    intersection = gts - np.cumsum(gt_sorted)
    union = gts + np.cumsum(1.0 - gt_sorted)
    jaccard = 1.0 - intersection / union
    if len(jaccard) > 1:
        jaccard[1:] = jaccard[1:] - jaccard[:-1]
    return float(np.maximum(errors_sorted, 0.0) @ jaccard)


def test_lovasz_hinge_matches_reference(rng):
    b, h, w = 3, 6, 6
    logits = rng.standard_normal((b, h, w)).astype(np.float32) * 2
    labels = rng.integers(0, 2, size=(b, h, w)).astype(np.int32)
    labels[rng.random((b, h, w)) < 0.2] = 255

    expected = np.mean([
        _np_lovasz_hinge_flat(
            logits[i].reshape(-1)[labels[i].reshape(-1) != 255],
            labels[i].reshape(-1)[labels[i].reshape(-1) != 255].astype(np.float64))
        for i in range(b)])
    got = float(losses.lovasz_hinge(jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_binary_xloss_matches_bce(rng):
    logits = rng.standard_normal((2, 8, 8)).astype(np.float32)
    labels = rng.integers(0, 2, size=(2, 8, 8)).astype(np.int32)
    labels[rng.random((2, 8, 8)) < 0.2] = 255
    valid = labels != 255
    expected = F.binary_cross_entropy_with_logits(
        torch.from_numpy(logits[valid]),
        torch.from_numpy(labels[valid].astype(np.float32))).item()
    got = float(losses.binary_xloss(jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_get_weights_median_frequency():
    target = np.array([0] * 10 + [1] * 5 + [2] * 1 + [255] * 3)
    w = losses.get_weights(target, num_classes=4)
    counts = np.array([10, 5, 1])
    med = np.median(counts)
    np.testing.assert_allclose(w[:3], med / counts, rtol=1e-6)
    assert w[3] == 1.0  # absent class keeps weight 1 (reference :20-21)


def test_lovasz_binned_matches_exact(rng):
    from segtpu.losses import lovasz_softmax, lovasz_softmax_binned

    logits, target = make_batch(rng, b=2, h=24, w=24, c=7)
    exact = float(losses.lovasz_softmax(jnp.asarray(logits), jnp.asarray(target)))
    approx = float(lovasz_softmax_binned(jnp.asarray(logits),
                                         jnp.asarray(target), bins=256))
    assert abs(exact - approx) < 5e-4, (exact, approx)
    # gradients point the same way (grouped surrogate)
    import jax

    g1 = jax.grad(lambda l: losses.lovasz_softmax(l, jnp.asarray(target)))(
        jnp.asarray(logits))
    g2 = jax.grad(lambda l: lovasz_softmax_binned(l, jnp.asarray(target),
                                                  bins=256))(jnp.asarray(logits))
    cos = float(jnp.sum(g1 * g2) /
                (jnp.linalg.norm(g1) * jnp.linalg.norm(g2)))
    assert cos > 0.8, cos


def test_lovasz_registry_dispatch(monkeypatch, rng):
    """Config name 'LovaszSoftmax' routes to the binned form on TPU and the
    exact form elsewhere; 'LovaszSoftmaxExact' always sorts."""
    import jax

    import segtpu.losses as L

    logits = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
    target = jnp.asarray(rng.integers(0, 4, size=(2, 8, 8)).astype(np.int32))

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    got_tpu = float(L.get_loss("LovaszSoftmax")(logits, target))
    want_binned = float(L.lovasz_softmax_binned(logits, target))
    assert got_tpu == want_binned

    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    got_cpu = float(L.get_loss("LovaszSoftmax")(logits, target))
    want_exact = float(L.lovasz_softmax(logits, target))
    assert got_cpu == want_exact
    assert float(L.get_loss("LovaszSoftmaxExact")(logits, target)) == want_exact
