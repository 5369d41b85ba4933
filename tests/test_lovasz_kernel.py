"""Pallas Lovász-histogram kernel vs the XLA reference (interpreter mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segtpu.ops import lovasz_kernel as lk


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setattr(lk, "INTERPRET", True)


def _data(rng, p=3000, c=7):
    logits = rng.normal(size=(p, c)).astype(np.float32)
    probs = jnp.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    target = rng.integers(0, c, size=(p,)).astype(np.int32)
    target[rng.random(p) < 0.1] = 255
    return probs, jnp.asarray(target)


def test_forward_matches_reference(rng):
    probs, target = _data(rng)
    for bins in (64, 128):
        got = lk.lovasz_histograms(probs, target, bins, 255)
        want = lk.histograms_reference(probs, target, bins, 255)
        for g, w, name in zip(got, want, ("cum_fg", "cum_all", "cum_err")):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=1e-5, atol=1e-3, err_msg=name)


def test_backward_matches_reference(rng):
    probs, target = _data(rng, p=2048)

    def loss_k(pr):
        _, _, ce = lk.lovasz_histograms(pr, target, 64, 255)
        return jnp.sum(jnp.sin(ce * 0.01))

    def loss_r(pr):
        _, _, ce = lk.histograms_reference(pr, target, 64, 255)
        return jnp.sum(jnp.sin(ce * 0.01))

    gk = jax.grad(loss_k)(probs)
    gr = jax.grad(loss_r)(probs)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                               rtol=1e-4, atol=1e-6)


def test_unaligned_p_is_masked_correctly(rng):
    probs, target = _data(rng, p=1537)  # not a multiple of the tile
    got = lk.lovasz_histograms(probs, target, 64, 255)
    want = lk.histograms_reference(probs, target, 64, 255)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-5, atol=1e-3)


def test_negative_ignore_index(rng):
    probs, target = _data(rng, p=1024)
    target = np.asarray(target).copy()
    target[target == 255] = -1
    target = jnp.asarray(target)
    got = lk.lovasz_histograms(probs, target, 64, -1)
    want = lk.histograms_reference(probs, target, 64, -1)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-5, atol=1e-3)
