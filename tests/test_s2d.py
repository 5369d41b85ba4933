"""Space-to-depth stem conv (ops/s2d.py): exact equivalence to the stride-2
conv it replaces — forward, input gradient, and weight gradient — plus the
backbone-flag path producing identical logits with identical params."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from segtpu.ops.s2d import s2d_stem_conv


def _ref_conv(x, w, stride, pad):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("k,pad", [(3, 1), (7, 3)])
@pytest.mark.parametrize("hw", [(64, 64), (65, 63), (33, 34)])
def test_s2d_stem_conv_matches_stride2_conv(rng, k, pad, hw):
    h, w = hw
    x = jnp.asarray(rng.standard_normal((2, h, w, 3)).astype(np.float32))
    kern = jnp.asarray(rng.standard_normal((k, k, 3, 16)).astype(np.float32))

    ref = _ref_conv(x, kern, 2, pad)
    got = s2d_stem_conv(x, kern, padding=pad)
    assert got.shape == ref.shape
    # Same multiply-adds, different association order: f32 noise only.
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    # Gradients: same arithmetic => same cotangents (to reassociation).
    def loss_ref(xx, ww):
        y = _ref_conv(xx, ww, 2, pad)
        return jnp.sum(jnp.sin(y))

    def loss_s2d(xx, ww):
        y = s2d_stem_conv(xx, ww, padding=pad)
        return jnp.sum(jnp.sin(y))

    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, kern)
    gx_s, gw_s = jax.grad(loss_s2d, argnums=(0, 1))(x, kern)
    # gw sums thousands of reassociated products; noise scales with that.
    np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_r),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw_s), np.asarray(gw_r),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("style", ["encoding", "torchvision"])
def test_s2d_stem_flag_same_logits(rng, style):
    """ResNetFeatures(s2d_stem=True) is a pure graph relayout: identical
    params (same names/shapes) and identical stage outputs."""
    from segtpu.backbones.resnet import ResNetFeatures

    x = jnp.asarray(rng.standard_normal((1, 33, 33, 3)).astype(np.float32))
    base = ResNetFeatures(arch="resnet50", style=style)
    s2d = ResNetFeatures(arch="resnet50", style=style, s2d_stem=True)

    params = base.init(jax.random.PRNGKey(0), x, train=False)
    # Param trees must be interchangeable (checkpoint compatibility).
    jax.tree.map(lambda a, b: None,
                 params, s2d.init(jax.random.PRNGKey(0), x, train=False))

    f0 = base.apply(params, x, train=False)
    f1 = s2d.apply(params, x, train=False)
    for a, b in zip(f0, f1):
        # Reassociation noise at the stem, amplified through 50 layers.
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)
