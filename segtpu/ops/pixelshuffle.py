"""Pixel shuffle (depth-to-space) for DUC heads.

The reference's Dense Upsampling Convolution uses ``nn.PixelShuffle``
(reference models/duc_hdc.py:15-49). On NHWC this is a pure reshape/transpose,
which XLA lowers to a free layout change fused into neighbours.
"""

from __future__ import annotations

import jax.numpy as jnp


def pixel_shuffle(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """NHWC depth-to-space with torch PixelShuffle channel ordering.

    torch lays NCHW channels as (C_out, r, r); an NHWC input converted from a
    torch-trained weight therefore carries channels ordered (c, rh, rw), and we
    unpack in that order so converted weights stay numerically identical.
    """
    b, h, w, c = x.shape
    r = factor
    assert c % (r * r) == 0, f"channels {c} not divisible by {r * r}"
    c_out = c // (r * r)
    x = x.reshape(b, h, w, c_out, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # (B, H, rh, W, rw, C_out)
    return x.reshape(b, h * r, w * r, c_out)
