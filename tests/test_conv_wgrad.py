"""Pallas stem-conv weight-gradient kernel (interpret mode on CPU).

The kernel reformulates a stride-2 small-C wgrad as a dense space-to-depth
contraction (segtpu/ops/conv_wgrad.py); these tests pin its math against
XLA's own wgrad formulation, bf16-quantized like the kernel contracts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segtpu.ops import conv_wgrad as cw


def _bf16(a):
    return np.asarray(jnp.asarray(a, jnp.bfloat16), np.float32)


@pytest.mark.parametrize("shape", [
    (2, 65, 65, 3, 64, 7),   # torchvision 7x7 stem geometry (odd H/W)
    (1, 32, 48, 3, 16, 7),   # even + non-square
    (2, 64, 64, 4, 32, 7),   # non-RGB channel count
    (2, 65, 65, 3, 64, 3),   # encoding-style 3x3 stem
    (2, 33, 47, 5, 16, 3),   # ragged tiles + odd widths
])
def test_wgrad_matches_xla(shape):
    n, h, w, c, co, k = shape
    ho = (h + 2 * (k // 2) - k) // 2 + 1
    wo = (w + 2 * (k // 2) - k) // 2 + 1
    rng = np.random.default_rng(hash(shape) % 2**31)
    x = rng.normal(size=(n, h, w, c)).astype(np.float32)
    dy = rng.normal(size=(n, ho, wo, co)).astype(np.float32)
    ref = np.asarray(cw.stem_conv_wgrad_reference(
        jnp.asarray(_bf16(x)), jnp.asarray(_bf16(dy)), kernel=k))
    got = np.asarray(cw.stem_conv_wgrad(jnp.asarray(x), jnp.asarray(dy),
                                        kernel=k, interpret=True))
    assert got.shape == (k, k, c, co)
    err = np.max(np.abs(got - ref)) / max(np.max(np.abs(ref)), 1e-6)
    assert err < 5e-3, err


def test_custom_vjp_weight_grad(monkeypatch):
    """grad through pallas_stem_conv == grad through the plain XLA conv."""
    k, n, h, c, co = 3, 1, 33, 3, 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, h, h, c)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, k, c, co)).astype(np.float32) * 0.1)

    orig = cw.stem_conv_wgrad
    monkeypatch.setattr(
        cw, "stem_conv_wgrad",
        lambda x_, g_, kernel=7, interpret=False: orig(
            x_, g_, kernel=kernel, interpret=True))

    def loss_pallas(w_):
        return jnp.sum(jnp.tanh(cw.pallas_stem_conv(x, w_, k)))

    def loss_ref(w_):
        y = jax.lax.conv_general_dilated(
            x, w_, (2, 2), ((k // 2,) * 2, (k // 2,) * 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(jnp.tanh(y))

    g_p = jax.grad(loss_pallas)(w)
    monkeypatch.setattr(cw, "stem_conv_wgrad", orig)
    g_r = jax.grad(loss_ref)(w)
    err = float(jnp.max(jnp.abs(g_p - g_r)) / jnp.max(jnp.abs(g_r)))
    assert err < 5e-3, err
