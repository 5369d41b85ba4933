"""Sub-pixel ConvTranspose rewrite: exact equivalence vs the lhs-dilated
conv lowering, for every (k, s, p, output_padding) the zoo uses plus fuzz
cases (including s > k, where some output phases are pure zeros/bias).

The rewrite (nn/layers.py::_subpixel_conv_transpose) is the same arithmetic
as torch nn.ConvTranspose2d — the zoo parity suite pins that end-to-end;
this file pins the two internal paths against each other, fwd and grads.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segtpu.nn.layers import _subpixel_conv_transpose


def _dilated_reference(x, kernel, stride, padding, output_padding):
    kh, kw = kernel.shape[0], kernel.shape[1]
    sh, sw = stride
    ph, pw = padding
    oph, opw = output_padding
    flipped = jnp.flip(kernel, axis=(0, 1))
    return jax.lax.conv_general_dilated(
        x, flipped,
        window_strides=(1, 1),
        padding=((kh - 1 - ph, kh - 1 - ph + oph),
                 (kw - 1 - pw, kw - 1 - pw + opw)),
        lhs_dilation=(sh, sw),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


# (kh, kw, sh, sw, ph, pw, oph, opw) — first three rows are the zoo's
# deconvs: UNet/SegResNet k2s2, UNetResnet k4s2p1, ENet/GCN k3s2p1op1.
CONFIGS = [
    (2, 2, 2, 2, 0, 0, 0, 0),
    (4, 4, 2, 2, 1, 1, 0, 0),
    (3, 3, 2, 2, 1, 1, 1, 1),
    (3, 3, 3, 3, 0, 0, 0, 0),
    (5, 5, 2, 2, 2, 2, 1, 1),
    (2, 2, 3, 3, 0, 0, 0, 0),   # s > k: phase 2 carries no kernel tap
    (2, 3, 2, 3, 0, 1, 1, 0),   # rectangular, asymmetric padding
    (1, 1, 2, 2, 0, 0, 1, 1),   # 1x1 kernel, pure upsample-scatter
]


@pytest.mark.parametrize("cfg", CONFIGS)
def test_subpixel_matches_dilated_fwd(cfg):
    kh, kw, sh, sw, ph, pw, oph, opw = cfg
    rng = np.random.default_rng(hash(cfg) % 2**31)
    x = jnp.asarray(rng.normal(size=(2, 9, 11, 5)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(kh, kw, 5, 7)).astype(np.float32))
    got = _subpixel_conv_transpose(x, k, (sh, sw), (ph, pw), (oph, opw))
    want = _dilated_reference(x, k, (sh, sw), (ph, pw), (oph, opw))
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("cfg", CONFIGS[:3])
def test_subpixel_matches_dilated_grads(cfg):
    kh, kw, sh, sw, ph, pw, oph, opw = cfg
    rng = np.random.default_rng(hash(cfg) % 2**31)
    x = jnp.asarray(rng.normal(size=(2, 6, 7, 4)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(kh, kw, 4, 3)).astype(np.float32))

    def loss_sub(x, k):
        y = _subpixel_conv_transpose(x, k, (sh, sw), (ph, pw), (oph, opw))
        return jnp.sum(jnp.sin(y))

    def loss_dil(x, k):
        return jnp.sum(jnp.sin(
            _dilated_reference(x, k, (sh, sw), (ph, pw), (oph, opw))))

    gx1, gk1 = jax.grad(loss_sub, argnums=(0, 1))(x, k)
    gx2, gk2 = jax.grad(loss_dil, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk1), np.asarray(gk2),
                               rtol=1e-4, atol=1e-4)
