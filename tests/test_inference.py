"""Inference modes: sliding-window count normalization, flip averaging,
multi-scale averaging."""

import numpy as np

from segtpu.inference_lib import multi_scale_predict, sliding_predict

NC = 4


def _linear_predictor(x):
    """Fake model: logits[c] = c * mean_channels(x). Shape-preserving and
    flip-equivariant, so flip-averaging must be exact."""
    x = np.asarray(x)
    base = x.mean(-1, keepdims=True)
    return np.concatenate([base * (c + 1) for c in range(NC)], axis=-1)


def test_sliding_covers_everything_and_normalizes():
    img = np.random.default_rng(0).normal(size=(50, 70, 3)).astype(np.float32)
    out = sliding_predict(_linear_predictor, img, NC, flip=False)
    assert out.shape == (50, 70, NC)
    # the fake model is spatially pointwise, so tiling+normalization must
    # reproduce the single-shot result exactly (away from pad regions)
    ref = _linear_predictor(img[None])[0]
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_sliding_flip_is_exact_for_equivariant_model():
    img = np.random.default_rng(1).normal(size=(40, 40, 3)).astype(np.float32)
    out = sliding_predict(_linear_predictor, img, NC, flip=True)
    ref = _linear_predictor(img[None])[0]
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_multi_scale_shapes_and_identity_scale():
    img = np.random.default_rng(2).normal(size=(32, 48, 3)).astype(np.float32)
    out = multi_scale_predict(_linear_predictor, img, [1.0], NC)
    ref = _linear_predictor(img[None])[0]
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    out2 = multi_scale_predict(_linear_predictor, img, [0.75, 1.0, 1.5], NC,
                               flip=True)
    assert out2.shape == (32, 48, NC)
    assert np.isfinite(out2).all()


def test_bucketed_predictor_crops_back():
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from segtpu.inference_lib import make_predictor

    class Pointwise(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return {"out": nn.Conv(NC, (1, 1))(x)}

    model = Pointwise()
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 50, 70, 3)).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), x)
    exact = make_predictor(model, v["params"], {})
    bucketed = make_predictor(model, v["params"], {}, bucket=32)
    ye = np.asarray(exact(x))
    yb = np.asarray(bucketed(x))
    assert yb.shape == ye.shape == (1, 50, 70, NC)
    # pointwise model: padding cannot leak, results identical
    np.testing.assert_allclose(yb, ye, rtol=1e-6, atol=1e-6)
