"""Flat-row Pallas conv backward kernels (interpret mode on CPU).

Pins segtpu/ops/flatconv.py wgrad/dgrad against XLA's own transposed-conv
formulations, bf16-quantized like the kernels contract, across the shapes
the kernels are deployed on (stem 3x3 64ch, classifier 3x3 512->19) plus
edge geometries (ragged row tiles, 1x1, dilation, multi-image)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segtpu.ops import flatconv as fc


def _bf16(a):
    return np.asarray(jnp.asarray(a, jnp.bfloat16), np.float32)


def _xla_wgrad(x, dy, k, p, d):
    return jax.lax.conv_general_dilated(
        x.astype(jnp.float32).transpose(3, 1, 2, 0),
        dy.astype(jnp.float32).transpose(1, 2, 0, 3),
        window_strides=(d, d), padding=((p, p), (p, p)),
        rhs_dilation=(1, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).transpose(1, 2, 0, 3)[:k, :k]


def _xla_dgrad(dy, w, p, d):
    k = w.shape[0]
    flipped = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
    pad = d * (k - 1) - p
    return jax.lax.conv_general_dilated(
        dy.astype(jnp.float32), flipped.astype(jnp.float32), (1, 1),
        ((pad, pad), (pad, pad)), rhs_dilation=(d, d),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


CASES = [
    # (n, h, w, c, o, k, p, d)
    (2, 33, 33, 64, 64, 3, 1, 1),    # stem_conv2-like
    (2, 33, 33, 64, 128, 3, 1, 1),   # stem_conv3-like
    (1, 25, 25, 512, 19, 3, 1, 1),   # classifier-like (mask_dy side)
    (2, 17, 29, 8, 16, 3, 1, 1),     # non-square, ragged tiles
    (2, 21, 21, 32, 48, 1, 0, 1),    # 1x1 degenerate (no halo, no taps)
    (1, 27, 27, 16, 24, 3, 2, 2),    # dilation 2 (layer3-style geometry)
    (3, 15, 15, 24, 8, 5, 2, 1),     # 5x5, three images
]


@pytest.mark.parametrize("case", CASES)
def test_wgrad_matches_xla(case):
    n, h, w, c, o, k, p, d = case
    rng = np.random.default_rng(hash(case) % 2**31)
    x = rng.normal(size=(n, h, w, c)).astype(np.float32)
    dy = rng.normal(size=(n, h, w, o)).astype(np.float32)
    ref = np.asarray(_xla_wgrad(jnp.asarray(_bf16(x)), jnp.asarray(_bf16(dy)),
                                k, p, d))
    got = np.asarray(fc.flat_conv_wgrad(
        jnp.asarray(x), jnp.asarray(dy), kernel_hw=(k, k), padding=p,
        dilation=d, interpret=True))
    assert got.shape == (k, k, c, o)
    err = np.max(np.abs(got - ref)) / max(np.max(np.abs(ref)), 1e-6)
    assert err < 5e-3, err


@pytest.mark.parametrize("case", CASES)
def test_dgrad_matches_xla(case):
    n, h, w, c, o, k, p, d = case
    rng = np.random.default_rng(hash(case) % 2**31)
    dy = rng.normal(size=(n, h, w, o)).astype(np.float32)
    wk = rng.normal(size=(k, k, c, o)).astype(np.float32) * 0.1
    ref = np.asarray(_xla_dgrad(jnp.asarray(_bf16(dy)), jnp.asarray(_bf16(wk)),
                                p, d))
    got = np.asarray(fc.flat_conv_dgrad(
        jnp.asarray(dy), jnp.asarray(wk), kernel_hw=(k, k), padding=p,
        dilation=d, interpret=True)).astype(np.float32)
    assert got.shape == (n, h, w, c)
    err = np.max(np.abs(got - ref)) / max(np.max(np.abs(ref)), 1e-6)
    assert err < 2e-2, err  # bf16 output quantization


def test_custom_vjp_grads(monkeypatch):
    """grad through flat_conv == grad through the plain XLA conv (both args)."""
    k, p, d, n, h, c, o = 3, 1, 1, 1, 19, 6, 10
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, h, h, c)).astype(np.float32))
    wk = jnp.asarray(rng.normal(size=(k, k, c, o)).astype(np.float32) * 0.2)

    orig_w, orig_d = fc.flat_conv_wgrad, fc.flat_conv_dgrad
    monkeypatch.setattr(fc, "flat_conv_wgrad",
                        functools_partial(orig_w, interpret=True))
    monkeypatch.setattr(fc, "flat_conv_dgrad",
                        functools_partial(orig_d, interpret=True))

    def loss_flat(x_, w_):
        return jnp.sum(jnp.tanh(fc.flat_conv(x_, w_, (k, k), p, d)))

    def loss_ref(x_, w_):
        y = jax.lax.conv_general_dilated(
            x_, w_, (1, 1), ((p, p), (p, p)), rhs_dilation=(d, d),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(jnp.tanh(y))

    gx, gw = jax.grad(loss_flat, argnums=(0, 1))(x, wk)
    rx, rw = jax.grad(loss_ref, argnums=(0, 1))(x, wk)
    for a, b in ((gx, rx), (gw, rw)):
        err = float(jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(b)))
        assert err < 2e-2, err


def functools_partial(f, **kw):
    import functools
    return functools.partial(f, **kw)
