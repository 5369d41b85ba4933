"""Space-to-depth stem convolution (graph-level, no custom kernel).

The zoo's stem convs (3x3/s2/C=3 for the encoding deep base, 7x7/s2/C=3 for
torchvision-style — reference models/resnet.py:94-100,
torchvision resnet stem) are the worst shapes for XLA:TPU's conv emitters:
3 input channels fill 3/128 MXU lanes and the stride-2 weight gradient runs
at 54-107 TFLOP/s and ~300 GB/s (README roofline — neither compute- nor
bandwidth-saturated).

The classic MLPerf-TPU fix is algebraic, not a kernel: a stride-2 conv over
(H, W, C) is EXACTLY a stride-1 conv over the 2x2 space-to-depth view
(H/2, W/2, 4C) with the kernel's taps redistributed the same way,

    y[oi,oj,o] = sum_{ky,kx,c} w[ky,kx,c,o] * xp[2oi+ky, 2oj+kx, c]
               = sum_{ty,tx,(dy,dx,c)} w2[ty,tx,(dy,dx,c),o]
                                       * z[oi+ty, oj+tx, (dy,dx,c)]

with z[i,j,(dy,dx,c)] = xp[2i+dy, 2j+dx, c] and ky = 2*ty+dy. Same
multiply-adds, so numerics match to reassociation (exact in f32 tests); but
the transformed conv has stride 1, 4x the channels and 1/4 the positions —
shapes both the forward emitter and (crucially) the weight-gradient emitter
tile far better. The input transform is a single reshape/transpose that XLA
fuses into the device-side normalize; the kernel transform is a few-KB
pad+reshape done once per step on the fp32 params.

Unlike the Pallas wgrad route (ops/conv_wgrad.py), whose in-step cost was
dominated by an 8.5 ms XLA space-to-depth preamble *on the gradient*, here
the s2d happens once on the INPUT in the forward pass — the saved activation
for the backward already lives in s2d layout, so the wgrad needs no
per-step relayout at all.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) -> (N, H/2, W/2, 4C); H, W must be even.

    Channel order is (dy, dx, c) — the same order ``s2d_kernel`` uses.
    """
    n, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    z = x.reshape(n, h // 2, 2, w // 2, 2, c)
    z = z.transpose(0, 1, 3, 2, 4, 5)
    return z.reshape(n, h // 2, w // 2, 4 * c)


def s2d_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """(k, k, C, O) stride-2 kernel -> (ceil(k/2), ceil(k/2), 4C, O) stride-1.

    Odd k is zero-padded to k+1 at the bottom/right (those taps read rows
    the stride-2 window never visits in the extra parity, so zeros are
    exact, not approximate).
    """
    k = kernel.shape[0]
    ke = k + (k % 2)
    w = jnp.pad(kernel, ((0, ke - k), (0, ke - k), (0, 0), (0, 0)))
    c, o = kernel.shape[2], kernel.shape[3]
    w = w.reshape(ke // 2, 2, ke // 2, 2, c, o)
    w = w.transpose(0, 2, 1, 3, 4, 5)  # (ty, tx, dy, dx, c, o)
    return w.reshape(ke // 2, ke // 2, 4 * c, o)


def s2d_stem_conv(x: jnp.ndarray, kernel: jnp.ndarray,
                  padding: int) -> jnp.ndarray:
    """Bias-free stride-2 conv, computed as a stride-1 conv in s2d space.

    ``x`` (N, H, W, C) NHWC, ``kernel`` (k, k, C, O) HWIO in the ORIGINAL
    stride-2 layout (params/checkpoints/converters are untouched — the
    relayout is part of the graph). Matches
    ``Conv(O, k, stride=2, padding=padding, use_bias=False)`` exactly:
    output size floor((H + 2*padding - k)/2) + 1 per dim.
    """
    n, h, w, c = x.shape
    k = kernel.shape[0]
    # Pad top/left by `padding`; bottom/right by `padding` plus one extra
    # zero row/col when H+2p is odd so the 2x2 s2d blocks tile it. The
    # extra row is beyond every window the stride-2 conv reads (or hits a
    # zero kernel tap), so the output is unchanged.
    eh = (h + 2 * padding) % 2
    ew = (w + 2 * padding) % 2
    xp = jnp.pad(x, ((0, 0), (padding, padding + eh),
                     (padding, padding + ew), (0, 0)))
    z = space_to_depth(xp)
    wz = s2d_kernel(kernel).astype(z.dtype)
    out = jax.lax.conv_general_dilated(
        z, wz, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    oh = (h + 2 * padding - k) // 2 + 1
    ow = (w + 2 * padding - k) // 2 + 1
    # VALID on the (possibly over-padded) s2d grid can yield one extra
    # output row/col relative to the stride-2 formula; crop it.
    return out[:, :oh, :ow, :]
