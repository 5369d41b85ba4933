"""MXU one-hot Lovász histograms vs the float32 compare reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segtpu.ops import lovasz_hist as lh


def _data(rng, p=3000, c=7):
    logits = rng.normal(size=(p, c)).astype(np.float32)
    probs = jnp.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    target = rng.integers(0, c, size=(p,)).astype(np.int32)
    target[rng.random(p) < 0.1] = 255
    return probs, jnp.asarray(target)


def test_forward_matches_reference(rng):
    probs, target = _data(rng)
    for bins in (64, 128):
        got = lh.histograms_onehot(probs, target, bins, 255)
        want = lh.histograms_compare(probs, target, bins, 255)
        for g, w, name in zip(got, want, ("cum_fg", "cum_all", "cum_err")):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=1e-5, atol=1e-3, err_msg=name)


def test_backward_matches_reference(rng):
    probs, target = _data(rng, p=2048)

    def loss_k(pr):
        _, _, ce = lh.histograms_onehot(pr, target, 64, 255)
        return jnp.sum(jnp.sin(ce * 0.01))

    def loss_r(pr):
        _, _, ce = lh.histograms_compare(pr, target, 64, 255)
        return jnp.sum(jnp.sin(ce * 0.01))

    gk = jax.grad(loss_k)(probs)
    gr = jax.grad(loss_r)(probs)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                               rtol=1e-4, atol=1e-6)


def test_boundary_errors_bucketized_like_compare(rng):
    """Errors landing EXACTLY on a threshold must fall in the same bin as
    the >= compare (err = 1.0 from saturated probs, err = 0 from ignored
    pixels)."""
    c = 4
    probs = jnp.asarray([[1.0, 0.0, 0.0, 0.0],    # err[0]=0 for y=0
                         [0.0, 1.0, 0.0, 0.0],    # err[0]=1 for y=0
                         [0.25, 0.25, 0.25, 0.25]], jnp.float32)
    target = jnp.asarray([0, 0, 255], jnp.int32)
    got = lh.histograms_onehot(probs, target, 64, 255)
    want = lh.histograms_compare(probs, target, 64, 255)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-6)


def test_negative_ignore_index(rng):
    probs, target = _data(rng, p=1024)
    target = np.asarray(target).copy()
    target[target == 255] = -1
    target = jnp.asarray(target)
    got = lh.histograms_onehot(probs, target, 64, -1)
    want = lh.histograms_compare(probs, target, 64, -1)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-5, atol=1e-3)
