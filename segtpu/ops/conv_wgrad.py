"""Pallas TPU kernel: weight gradients of small-C stride-2 stem convs.

Why: the profiled round-2 roofline (README) shows XLA's conv weight-gradient
emitter running the stem/layer1 wgrads at 54-107 TFLOP/s AND only ~300 GB/s
— neither compute- nor bandwidth-saturated. The root cause is shape
pathology: a wgrad with tiny C_in contracts a huge spatial axis into a tiny
(k*k*C, CO) output, so MXU passes are almost empty. This kernel fixes the
shape, not the schedule:

* **Space-to-depth**: a stride-2 kxk conv over C channels is re-expressed
  as a DENSE ceil((k+1)/2)-tap conv over 4C channels (pad H,W to even, fold
  each 2x2 pixel block into channels). The stride disappears; the tap count
  drops k^2 -> K4^2 (49 -> 16 for k=7, 9 -> 4 for k=3).
* **Tap concatenation**: per row-tile, the K4 width-shifted views of the
  s2d input are stacked along channels so the weight gradient is K4 fat MXU
  contractions of (K4*4C, P) x (P, CO) per tile instead of k^2 skinny
  (C, P) x (P, CO) ones — far better sublane utilization on the MXU.
* **Sequential-grid accumulation**: TPU grid steps run in order on one
  core; the (K4, K4*4C, CO) fp32 accumulator lives in the output ref, and
  the last K4-1 dy rows of each tile are carried in VMEM scratch for the
  cross-tile halo (dy row h pairs with s2d rows h..h+K4-1).

Both inputs are read from HBM exactly once (~180 MB at Cityscapes 7x7-stem
shapes -> ~0.25 ms at BW peak; shifts and dots stay on-chip).

``stem_conv_wgrad`` returns the (k, k, C, CO) HWIO gradient; model wire-up
goes through ``pallas_stem_conv`` (a ``jax.custom_vjp`` conv) behind the
``pallas_stem_wgrad`` flag of ``backbones/resnet.py::ResNetFeatures``.

MEASURED OUTCOME (round 3, v5e, 3x3-s2 stem at 769^2 bs8): the kernel
proper runs in ~0.5 ms — 9x faster than XLA's 4.5 ms wgrad emitter — but
the XLA-side layout preamble feeding it (6-D space-to-depth transpose
5.0 ms + dy row/lane pad 3.5 ms, both ~100 GB/s data-movement emissions)
costs more than it saves, and does not fuse away inside the full train
step: in-step A/B (scripts/wgrad_ab.py) 200.3 ms/step XLA vs 213.1 ms/step
Pallas. The flag therefore defaults to OFF; see README "profiled roofline".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(k4: int):
    halo = k4 - 1

    def kernel(xs_ref, dy_ref, out_ref, carry_ref, acc_ref, patch_ref):
        """One (n, h-tile) grid step.

        xs_ref:   (1, TH, Wp, C4)        s2d rows [i*TH, i*TH+TH)
        dy_ref:   (1, TH, Wo, LO)        output grads, lanes pre-padded
                                         to LO=128 multiple OUTSIDE the
                                         kernel (a partial-lane scratch
                                         store here raced the first tap's
                                         dot on real Mosaic — interpret
                                         mode serialized it and hid it)
        out_ref:  (K4, K4*C4, LO) fp32   accumulated dW4, a-major taps
        carry_ref:(HALO, Wo, LO)         last HALO dy rows of previous tile
        acc_ref:  (TH+HALO, Wo, LO)      scratch: [carry ; dy_tile]
        patch_ref:(TH, Wo, Lx)           lane-aligned patch matrix

        Mosaic can neither reshape non-128-lane vectors nor concatenate
        offset slices on the lane axis, so the patch matrix is assembled
        with STORES into lane-padded VMEM scratch (stores normalize
        layout); the reads then reshape contiguously to 2D for single-
        contraction-dim tpu.matmuls. The MXU pad waste is minor — the
        contraction axis (TH*Wo) is the big one.
        """
        n = pl.program_id(0)
        i = pl.program_id(1)
        th, c4 = xs_ref.shape[1], xs_ref.shape[3]
        wo, lo = dy_ref.shape[2], dy_ref.shape[3]
        lx = patch_ref.shape[2]

        @pl.when(jnp.logical_and(n == 0, i == 0))
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        @pl.when(i == 0)
        def _():
            # no dy rows precede the first tile of an image
            acc_ref[0:halo] = jnp.zeros_like(acc_ref[0:halo])

        @pl.when(i != 0)
        def _():
            acc_ref[0:halo] = carry_ref[:]

        acc_ref[halo:] = dy_ref[0]

        xs = xs_ref[0]  # (TH, Wp, C4)

        # dW4[a, b] = sum_{j, w} xs[j, w + b, :] * dy[i*TH + j - a, w, :].
        # The K4 b-shifted views share one patch build (a-independent).
        if lx > k4 * c4:
            patch_ref[:, :, k4 * c4:] = jnp.zeros((th, wo, lx - k4 * c4),
                                                  xs.dtype)
        for b in range(k4):
            patch_ref[:, :, b * c4:(b + 1) * c4] = jax.lax.slice(
                xs, (0, b, 0), (th, b + wo, c4))
        patches = patch_ref[:].reshape(th * wo, lx)
        for a in range(k4):
            dy_a = acc_ref[halo - a:halo - a + th].reshape(th * wo, lo)
            contrib = jax.lax.dot_general(
                patches, dy_a,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (Lx, LO)
            out_ref[a] += contrib[: k4 * c4]

        # save this tile's last HALO dy rows for the next tile
        carry_ref[:] = acc_ref[th:th + halo]

    return kernel


def _space_to_depth_t(x, pad, rows_needed):
    """(N, H, W, C) -> (N, rows, Wp/2, 4C): 2x2 pixel blocks folded into
    trailing channels (order (r, q, c))."""
    n, h, w, c = x.shape
    hp = h + 2 * pad
    wp = w + 2 * pad
    hp += hp % 2
    wp += wp % 2
    extra_h = max(0, rows_needed * 2 - hp)
    x = jnp.pad(x, ((0, 0), (pad, hp - h - pad + extra_h),
                    (pad, wp - w - pad), (0, 0)))
    hp += extra_h
    x = x.reshape(n, hp // 2, 2, wp // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # n, hs, ws, r, q, c
    return x.reshape(n, hp // 2, wp // 2, 4 * c)[:, :rows_needed]


@functools.partial(jax.jit, static_argnames=("kernel", "interpret"))
def stem_conv_wgrad(x, dy, kernel: int = 7, interpret: bool = False):
    """dL/dW (HWIO (k, k, C, CO), fp32) of conv kxk / stride 2 / pad k//2.

    ``x``: (N, H, W, C) conv input (contracted in bf16),
    ``dy``: (N, H', W', CO) output cotangent, H' = (H + 2*(k//2) - k)//2 + 1.
    ``kernel``: odd k (3 or 7 in the zoo's stems).
    """
    n, h, w, c = x.shape
    _, ho, wo, co = dy.shape
    k = kernel
    k4 = (k + 2) // 2  # dense tap extent after s2d: ceil((k+1)/2)
    halo = k4 - 1
    c4 = 4 * c

    # The grid walks s2d rows; every s2d row j contributes xs[j]*dy[j-a] for
    # taps a in [0, K4), so the grid must cover ho + HALO rows. Round up to
    # a tile multiple with ZERO rows on both arrays (zero xs rows and zero
    # dy cotangent rows contribute nothing).
    th = 16
    ho_p = -(-(ho + halo) // th) * th
    co_p = co + (-co % 128)  # lane-pad dy OUTSIDE the kernel (see kernel doc)
    xs = _space_to_depth_t(x.astype(jnp.bfloat16), pad=k // 2,
                           rows_needed=ho_p)
    wp = xs.shape[2]
    dy = jnp.pad(dy.astype(jnp.bfloat16),
                 ((0, 0), (0, ho_p - ho), (0, 0), (0, co_p - co)))

    grid = (n, ho_p // th)
    dw4 = pl.pallas_call(
        _make_kernel(k4),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, th, wp, c4), lambda nn, ii: (nn, ii, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, wo, co_p), lambda nn, ii: (nn, ii, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k4, k4 * c4, co_p),
                               lambda nn, ii: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k4, k4 * c4, co_p), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((halo, wo, co_p), jnp.bfloat16),
            pltpu.VMEM((th + halo, wo, co_p), jnp.bfloat16),
            pltpu.VMEM((th, wo, k4 * c4 + (-(k4 * c4) % 128)), jnp.bfloat16),
        ],
        interpret=interpret,
    )(xs, dy)
    dw4 = dw4[..., :co]

    # Un-fold the dense K4xK4x(r,q,c) taps back onto the kxk kernel:
    # dW[2a+r, 2b+q, ch] = dW4[a, b, (r, q, ch)]; combinations with
    # 2a+r >= k (resp. kw) fall outside the kernel extent and are dropped.
    dw4 = dw4.reshape(k4, k4, 2, 2, c, co)  # a, b, r, q, c, o
    full = 2 * k4
    dw = jnp.zeros((full, full, c, co), jnp.float32)
    dw = dw.at[0::2, 0::2].set(dw4[:, :, 0, 0])
    dw = dw.at[0::2, 1::2].set(dw4[:, :, 0, 1])
    dw = dw.at[1::2, 0::2].set(dw4[:, :, 1, 0])
    dw = dw.at[1::2, 1::2].set(dw4[:, :, 1, 1])
    return dw[:k, :k]


def stem_conv_wgrad_reference(x, dy, kernel: int = 7):
    """XLA reference (same math, fp32) for A/B and tests."""
    p = kernel // 2
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32).transpose(3, 1, 2, 0),   # C, H, W, N
        dy.astype(jnp.float32).transpose(1, 2, 0, 3),  # H', W', N, CO
        window_strides=(1, 1),
        padding=((p, p), (p, p)),
        rhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).transpose(1, 2, 0, 3)
    # even H/W admit a phantom extra shift; the conv kernel has k taps
    return out[:kernel, :kernel]


# ---------------------------------------------------------------------------
# custom_vjp conv that swaps ONLY the weight gradient for the Pallas kernel
# (dx falls back to XLA's transposed conv; for the true stem conv dx is dead
# code anyway — the input is data).

@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def pallas_stem_conv(x, kernel_hwio, k: int):
    """NHWC conv, kxk / stride 2 / pad k//2, bias-free — forward is XLA's
    conv; the backward weight gradient is the Pallas wgrad kernel."""
    return jax.lax.conv_general_dilated(
        x, kernel_hwio.astype(x.dtype), (2, 2),
        ((k // 2, k // 2), (k // 2, k // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _fwd(x, kernel_hwio, k):
    # the kernel itself is a tiny residual (k*k*C*CO) — kept for its dtype
    return pallas_stem_conv(x, kernel_hwio, k), (x, kernel_hwio)


def _bwd(k, res, g):
    x, w = res
    dw = stem_conv_wgrad(x, g, kernel=k).astype(w.dtype)
    # The stem conv's lhs is the MODEL INPUT (data): its cotangent is dead
    # code under grad-wrt-params, so a zero dx is free after DCE. Do NOT use
    # pallas_stem_conv mid-network where a real dx is needed.
    dx = jnp.zeros_like(x)
    return dx, dw


pallas_stem_conv.defvjp(_fwd, _bwd)
