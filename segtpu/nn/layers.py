"""Core layers: Conv / ConvTranspose / BatchNorm with torch-parity semantics.

Design notes (TPU-first):

* NHWC activations, HWIO kernels — the layouts XLA:TPU tiles onto the MXU
  without transposes.
* BatchNorm computes batch statistics with plain ``jnp.mean`` over the global
  logical array. Under ``jit`` with a sharded batch the GSPMD partitioner
  inserts the cross-replica all-reduce automatically, so this one layer *is*
  the synchronized BatchNorm that costs the reference 741 lines of
  thread-rendezvous machinery (reference utils/sync_batchnorm/).
* ConvTranspose implements exact ``nn.ConvTranspose2d`` arithmetic
  (kernel/stride/padding/output_padding) via an input-dilated convolution,
  which XLA lowers to a single MXU conv.
"""

from __future__ import annotations

import math
import os
from typing import Any, Callable, Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

# Route 1x1/stride-1 convs through lax.dot_general instead of the conv
# emitter (see Conv.__call__). MEASURED LOSER, so default OFF: in the full
# PSPNet-R50 769^2 bs8 train step the dot form ran 216 ms/step vs 200 for
# the conv emission (scripts/conv1x1_ab.py, both the flattened-2D and the
# direct 4-D contraction variants) — XLA's conv emitter wins in context
# even though the op-stats table shows those convs at half peak; the
# "slack" is input fusions the dot path loses. Kept as an escape hatch.
_ONE_BY_ONE_AS_DOT = os.environ.get("SEGTPU_1X1_DOT", "0") == "1"

# Rewrite strided ConvTranspose as a stride-1 "sub-pixel" conv producing
# s_h*s_w*O channels followed by a depth-to-space interleave, instead of an
# lhs-dilated conv (same arithmetic; tests/test_layers_subpixel.py pins
# fwd+grad equivalence for every zoo deconv geometry). MEASURED LOSER on
# this chip, so OFF by default (opt in: SEGTPU_SUBPIX=1) — the fifth
# single-op attack to fail the in-step A/B (see README roofline section):
# full zoo sweep @769² bs8 with it ON vs the dilated default: UNetResnet
# train 29.6 vs 31.3 img/s, eval 74.8 vs 80.2; UNet eval 57.2 vs 61.6;
# UNet/SegNet/SegResNet/ENet/FCN8 train within noise. XLA's TPU emitter
# handles lhs-dilation well in-step; the sub-pixel form's depth-to-space
# relayout and the s_h*s_w*O-channel intermediate cost more than the
# zero-skipping saves.
_SUBPIXEL_DECONV = os.environ.get("SEGTPU_SUBPIX", "0") == "1"


def _pair(v) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


# ---------------------------------------------------------------------------
# Initializers (torch-parity)
# ---------------------------------------------------------------------------

def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """torch ``nn.Conv2d`` default: kaiming_uniform(a=sqrt(5)) ==
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)) with fan_in = kh*kw*in."""
    fan_in = shape[0] * shape[1] * shape[2]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_conv_bias_init(fan_in: int) -> Callable:
    """torch conv/linear default bias: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def kaiming_normal_init(key, shape, dtype=jnp.float32):
    """torch ``kaiming_normal_(w, nonlinearity='relu')``: N(0, 2/fan_in).

    Used by the reference's decoder initializer
    (reference utils/helpers.py:12-16, models/unet.py:83-91).
    """
    fan_in = shape[0] * shape[1] * shape[2]
    std = math.sqrt(2.0 / fan_in)
    return jax.random.normal(key, shape, dtype) * std


# ---------------------------------------------------------------------------
# Conv
# ---------------------------------------------------------------------------

class Conv(nn.Module):
    """2-D convolution with torch ``nn.Conv2d`` semantics on NHWC input.

    Kernel is HWIO; ``padding`` is the symmetric int/pair torch uses.
    """

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    dilation: Union[int, Tuple[int, int]] = 1
    groups: int = 1
    use_bias: bool = True
    kernel_init: Callable = torch_conv_kernel_init
    bias_init: Optional[Callable] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.stride)
        ph, pw = _pair(self.padding)
        dh, dw = _pair(self.dilation)
        in_ch = x.shape[-1]
        assert in_ch % self.groups == 0
        kshape = (kh, kw, in_ch // self.groups, self.features)
        kernel = self.param("kernel", self.kernel_init, kshape)
        dtype = self.dtype or x.dtype
        if (_ONE_BY_ONE_AS_DOT and kh == kw == 1 and (sh, sw) == (1, 1)
                and (ph, pw) == (0, 0) and self.groups == 1):
            # 1x1/s1 conv IS (NHW, C) @ (C, O). XLA:TPU's dot emitter tiles
            # this far better than its conv emitter at small/medium C: the
            # round-3 profile had 1x1 conv backwards at 94-107 TFLOP/s where
            # the same contraction as a dot runs near the 197 peak. The
            # flattening reshape is contiguous (free), and autodiff of a dot
            # yields dots — the whole bwd leaves the conv emitter too.
            y = jax.lax.dot_general(
                x.astype(dtype),
                kernel.astype(dtype).reshape(in_ch, self.features),
                dimension_numbers=(((3,), (0,)), ((), ())),
            )
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(dtype),
                kernel.astype(dtype),
                window_strides=(sh, sw),
                padding=((ph, ph), (pw, pw)),
                rhs_dilation=(dh, dw),
                feature_group_count=self.groups,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            fan_in = kh * kw * (in_ch // self.groups)
            bias_init = self.bias_init or torch_conv_bias_init(fan_in)
            bias = self.param("bias", bias_init, (self.features,))
            y = y + bias.astype(dtype)
        return y


def _subpixel_conv_transpose(x, kernel, stride, padding, output_padding):
    """ConvTranspose2d as a stride-1 conv + depth-to-space (exact arithmetic).

    out[b, s*y'+q - p, ...] = sum_t x[b, y'-t, ...] @ W[q + t*s, ...] — each
    output phase q in [0, s) is a T-tap (T = ceil(k/s)) stride-1 correlation
    of the input, so the whole op is ONE dense conv producing s_h*s_w*O
    channels on the un-dilated input, followed by an interleaving reshape and
    the torch padding/output_padding crop. Replaces the lhs-dilated conv
    lowering, whose TPU emitter streams a 3/4-zeros dilated input.
    """
    b, h, w, in_ch = x.shape
    kh, kw, _, out_ch = kernel.shape
    sh, sw = stride
    ph, pw = padding
    oph, opw = output_padding
    th = -(-kh // sh)
    tw = -(-kw // sw)
    wp = jnp.pad(kernel, ((0, th * sh - kh), (0, tw * sw - kw), (0, 0), (0, 0)))
    kf = wp.reshape(th, sh, tw, sw, in_ch, out_ch)
    kf = jnp.flip(kf, axis=(0, 2)).transpose(0, 2, 4, 1, 3, 5)
    kf = kf.reshape(th, tw, in_ch, sh * sw * out_ch)
    z = jax.lax.conv_general_dilated(
        x, kf,
        window_strides=(1, 1),
        padding=((th - 1, th - 1), (tw - 1, tw - 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    hc, wc = z.shape[1], z.shape[2]
    canvas = z.reshape(b, hc, wc, sh, sw, out_ch)
    canvas = canvas.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, sh * hc, sw * wc, out_ch)
    out_h = (h - 1) * sh - 2 * ph + kh + oph
    out_w = (w - 1) * sw - 2 * pw + kw + opw
    tail_h = max(ph + out_h - sh * hc, 0)
    tail_w = max(pw + out_w - sw * wc, 0)
    if tail_h or tail_w:
        canvas = jnp.pad(canvas, ((0, 0), (0, tail_h), (0, tail_w), (0, 0)))
    return canvas[:, ph:ph + out_h, pw:pw + out_w, :]


class ConvTranspose(nn.Module):
    """2-D transposed convolution with exact ``nn.ConvTranspose2d`` arithmetic.

    Output size = (in-1)*stride - 2*padding + dilation*(k-1) + output_padding + 1.
    Implemented as an lhs-dilated conv with a spatially-flipped kernel — a
    single fused MXU conv, no scatter. Kernel param is stored HWIO with
    I=input channels, O=output channels (converter maps torch's (I,O,kh,kw)).
    """

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 2
    stride: Union[int, Tuple[int, int]] = 2
    padding: Union[int, Tuple[int, int]] = 0
    output_padding: Union[int, Tuple[int, int]] = 0
    dilation: Union[int, Tuple[int, int]] = 1
    use_bias: bool = True
    kernel_init: Callable = torch_conv_kernel_init
    bias_init: Optional[Callable] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.stride)
        ph, pw = _pair(self.padding)
        oph, opw = _pair(self.output_padding)
        dh, dw = _pair(self.dilation)
        in_ch = x.shape[-1]
        # Torch's ConvTranspose2d kernel is (in, out, kh, kw) and its fan_in
        # for default init is out*kh*kw (weight.size(1)*k*k).
        kshape = (kh, kw, in_ch, self.features)
        kernel = self.param("kernel", self.kernel_init, kshape)
        dtype = self.dtype or x.dtype
        if _SUBPIXEL_DECONV and (dh, dw) == (1, 1) and (sh > 1 or sw > 1):
            y = _subpixel_conv_transpose(x.astype(dtype), kernel.astype(dtype),
                                         (sh, sw), (ph, pw), (oph, opw))
        else:
            # Transposed conv == conv over an lhs-dilated input with the
            # kernel flipped spatially and padding (dilation*(k-1) - p) per
            # side, plus output_padding on the trailing side.
            flipped = jnp.flip(kernel, axis=(0, 1)).astype(dtype)
            pad_h = dh * (kh - 1) - ph
            pad_w = dw * (kw - 1) - pw
            y = jax.lax.conv_general_dilated(
                x.astype(dtype),
                flipped,
                window_strides=(1, 1),
                padding=((pad_h, pad_h + oph), (pad_w, pad_w + opw)),
                lhs_dilation=(sh, sw),
                rhs_dilation=(dh, dw),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            fan_in = kh * kw * self.features
            bias_init = self.bias_init or torch_conv_bias_init(fan_in)
            bias = self.param("bias", bias_init, (self.features,))
            y = y + bias.astype(dtype)
        return y


# ---------------------------------------------------------------------------
# BatchNorm
# ---------------------------------------------------------------------------

class BatchNorm(nn.Module):
    """BatchNorm2d with torch semantics; cross-replica sync is free under jit.

    * eps 1e-5, running-stat momentum 0.1 (torch convention: new = (1-m)*old
      + m*batch), affine by default.
    * ``use_running_average`` is threaded from the model's ``train`` /
      ``freeze_bn`` flags; this replaces both ``module.eval()`` freezing
      (reference models/pspnet.py:103-105) and the vendored SyncBN
      (reference utils/sync_batchnorm/batchnorm.py:51-145): batch statistics
      computed over the globally-sharded batch axis are all-reduced by the
      GSPMD partitioner over ICI.
    * Running var uses the unbiased estimate for the running buffer but the
      biased one for normalization — exactly torch.
    """

    use_running_average: bool = False
    momentum: float = 0.1
    epsilon: float = 1e-5
    dtype: Optional[Dtype] = None
    scale_init: Callable = nn.initializers.ones
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: Optional[bool] = None) -> jnp.ndarray:
        use_ra = (self.use_running_average if use_running_average is None
                  else use_running_average)
        features = x.shape[-1]
        scale = self.param("scale", self.scale_init, (features,))
        bias = self.param("bias", self.bias_init, (features,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((features,), jnp.float32))

        # at-least-float32 statistics: bf16 activations upcast as before;
        # float64 (x64 dynamics-parity tests) stays float64 so the BN path
        # doesn't re-floor gradients at fp32 precision.
        stat_dtype = jnp.promote_types(x.dtype, jnp.float32)
        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(stat_dtype)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=axes)
            var = jnp.mean(jnp.square(xf), axis=axes) - jnp.square(mean)
            if not self.is_initializing():
                n = 1
                for a in axes:
                    n *= x.shape[a]
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased

        dtype = self.dtype or x.dtype
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        y = (x.astype(stat_dtype) - mean) * inv + bias
        return y.astype(dtype)


class ConvBNAct(nn.Module):
    """conv -> BN -> activation, the zoo's workhorse block."""

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    dilation: Union[int, Tuple[int, int]] = 1
    groups: int = 1
    use_bias: bool = False
    act: Optional[Callable] = nn.relu
    kernel_init: Callable = torch_conv_kernel_init

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = Conv(self.features, self.kernel_size, self.stride, self.padding,
                 self.dilation, self.groups, self.use_bias,
                 kernel_init=self.kernel_init, name="conv")(x)
        x = BatchNorm(name="bn")(x, use_running_average=not train)
        if self.act is not None:
            x = self.act(x)
        return x
