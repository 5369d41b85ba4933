"""Shared decoder blocks: separable conv, PSP pooling, ASPP, FPN fuse, DUC.

These are the reusable pieces of the model zoo's decoders. Layout is NHWC;
interpolation / adaptive pooling route through segtpu.ops (MXU matmuls).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from segtpu.nn.layers import (
    BatchNorm,
    Conv,
    kaiming_normal_init,
    torch_conv_kernel_init,
)
from segtpu.ops.pooling import adaptive_avg_pool_multi
from segtpu.ops.pixelshuffle import pixel_shuffle
from segtpu.ops.resize import resize_bilinear


class SeparableConv(nn.Module):
    """Depthwise 3x3 (+BN) then pointwise 1x1 — the Xception building block.

    Parity: reference models/deeplabv3_plus.py:70-86 (SeparableConv2d),
    including its padding rule ``padding = dilation if dilation > k//2 else
    k//2`` and the BN placed between depthwise and pointwise convs.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    use_bias: bool = False
    kernel_init: Callable = torch_conv_kernel_init

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        k, d = self.kernel_size, self.dilation
        padding = d if d > k // 2 else k // 2
        in_ch = x.shape[-1]
        x = Conv(in_ch, k, self.stride, padding, dilation=d, groups=in_ch,
                 use_bias=self.use_bias, kernel_init=self.kernel_init,
                 name="depthwise")(x)
        x = BatchNorm(name="bn")(x, use_running_average=not train)
        x = Conv(self.features, 1, 1, 0, use_bias=self.use_bias,
                 kernel_init=self.kernel_init, name="pointwise")(x)
        return x


class PSPModule(nn.Module):
    """Pyramid Scene Parsing pooling module.

    Adaptive-avg-pool to each bin size, 1x1 conv+BN+ReLU, bilinear upsample
    (align_corners=True), concat with the input, 3x3 bottleneck conv+BN+ReLU
    + dropout(0.1). Parity: reference models/pspnet.py:11-38 (_PSPModule,
    bottleneck out = in//len(bins)) and models/upernet.py:9-38 (PSPModule,
    bottleneck out = in) — select with ``out_features``.
    """

    bin_sizes: Sequence[int] = (1, 2, 3, 6)
    out_features: Optional[int] = None  # default: in // len(bin_sizes)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        in_ch = x.shape[-1]
        branch_ch = in_ch // len(self.bin_sizes)
        out_ch = self.out_features or branch_ch
        h, w = x.shape[1], x.shape[2]
        pyramids = [x]
        pooled = adaptive_avg_pool_multi(x, self.bin_sizes)
        for i, (b, p) in enumerate(zip(self.bin_sizes, pooled)):
            p = Conv(branch_ch, 1, use_bias=False,
                     kernel_init=kaiming_normal_init, name=f"stage{i}_conv")(p)
            p = BatchNorm(name=f"stage{i}_bn")(p, use_running_average=not train)
            p = nn.relu(p)
            pyramids.append(resize_bilinear(p, (h, w), align_corners=True))
        y = jnp.concatenate(pyramids, axis=-1)
        y = Conv(out_ch, 3, padding=1, use_bias=False,
                 kernel_init=kaiming_normal_init, name="bottleneck_conv")(y)
        y = BatchNorm(name="bottleneck_bn")(y, use_running_average=not train)
        y = nn.relu(y)
        y = nn.Dropout(0.1, deterministic=not train)(y)
        return y


class ASPP(nn.Module):
    """Atrous Spatial Pyramid Pooling.

    1x1 + (N-1) dilated 3x3 branches + global-average image pooling, concat,
    1x1 project + BN + ReLU + dropout(0.5). Parity: reference
    models/deeplabv3_plus.py:260-297 (4 branches, dilations from
    output_stride) and models/duc_hdc.py:126-174 (6 branches).
    """

    output_stride: int = 16
    num_branches: int = 4
    features: int = 256

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        if self.num_branches == 4:
            dilations = [1, 6, 12, 18] if self.output_stride == 16 else [1, 12, 24, 36]
        else:
            dilations = [1, 6, 12, 18, 24, 36][: self.num_branches]

        def branch(inp, k, d, name):
            pad = 0 if k == 1 else d
            y = Conv(self.features, k, padding=pad, dilation=d, use_bias=False,
                     kernel_init=kaiming_normal_init, name=f"{name}_conv")(inp)
            y = BatchNorm(name=f"{name}_bn")(y, use_running_average=not train)
            return nn.relu(y)

        outs = [branch(x, 1 if i == 0 else 3, d, f"aspp{i + 1}")
                for i, d in enumerate(dilations)]
        img = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True).astype(x.dtype)
        img = Conv(self.features, 1, use_bias=False,
                   kernel_init=kaiming_normal_init, name="pool_conv")(img)
        img = BatchNorm(name="pool_bn")(img, use_running_average=not train)
        img = nn.relu(img)
        img = resize_bilinear(img, (x.shape[1], x.shape[2]), align_corners=True)
        outs.append(img)

        y = jnp.concatenate(outs, axis=-1)
        y = Conv(self.features, 1, use_bias=False,
                 kernel_init=kaiming_normal_init, name="project_conv")(y)
        y = BatchNorm(name="project_bn")(y, use_running_average=not train)
        y = nn.relu(y)
        y = nn.Dropout(0.5, deterministic=not train)(y)
        return y


class FPNFuse(nn.Module):
    """UperNet's FPN fusion head (reference models/upernet.py:92-117).

    1x1-project every non-finest level to ``fpn_out``, top-down add with
    bilinear (align_corners=True) upsampling, 3x3 smooth per merged level,
    upsample all to the finest resolution, concat, 3x3 conv+BN+ReLU.
    """

    fpn_out: int = 256

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray], train: bool = True) -> jnp.ndarray:
        feats = list(features)
        n = len(feats)
        # The reference asserts feature_channels[0] == fpn_out
        # (models/upernet.py:95), which silently rules out resnet18/34
        # backbones at the default fpn_out; here the finest level gets its
        # own projection when widths differ (documented divergence).
        if feats[0].shape[-1] != self.fpn_out:
            feats[0] = Conv(self.fpn_out, 1, name="lateral_p0")(feats[0])
        for i in range(1, n):
            feats[i] = Conv(self.fpn_out, 1, name=f"lateral{i - 1}")(feats[i])
        # "top-down" merge, reference-exact (models/upernet.py:108-110):
        # the comprehension reads the UNMUTATED projected features, so each
        # P[j] = up(f[j+1]) + f[j] INDEPENDENTLY — not the cascaded FPN of
        # the original paper. Behavior-parity over textbook-FPN on purpose:
        # migrated reference checkpoints expect these semantics.
        merged = [
            resize_bilinear(feats[j + 1],
                            (feats[j].shape[1], feats[j].shape[2]),
                            align_corners=True) + feats[j]
            for j in range(n - 1)
        ]  # finest first, len n-1
        # NOTE: the reference builds smooth_conv with [module]*(n-1), i.e. ONE
        # shared 3x3 conv applied to every level (a latent bug upstream that
        # is nonetheless its behavior). We use per-level convs — documented
        # divergence (SURVEY.md §7 "known reference defects" spirit).
        merged = [Conv(self.fpn_out, 3, padding=1, name=f"smooth{i}")(m)
                  for i, m in enumerate(merged)]
        pyramid = merged + [feats[-1]]
        h, w = pyramid[0].shape[1], pyramid[0].shape[2]
        pyramid = [pyramid[0]] + [
            resize_bilinear(p, (h, w), align_corners=True) for p in pyramid[1:]
        ]
        y = jnp.concatenate(pyramid, axis=-1)
        y = Conv(self.fpn_out, 3, padding=1, use_bias=False, name="fusion_conv")(y)
        y = BatchNorm(name="fusion_bn")(y, use_running_average=not train)
        return nn.relu(y)


def _icnr_init(upscale: int):
    """ICNR init for the DUC 1x1 conv: each group of upscale^2 output channels
    shares one kaiming-normal subkernel so PixelShuffle starts checkerboard-
    free (reference models/duc_hdc.py:33-49, arXiv:1707.02937)."""

    def init(key, shape, dtype=jnp.float32):
        kh, kw, in_ch, out_ch = shape
        r2 = upscale * upscale
        sub = kaiming_normal_init(key, (kh, kw, in_ch, out_ch // r2), dtype)
        return jnp.repeat(sub, r2, axis=-1)

    return init


class DUC(nn.Module):
    """Dense Upsampling Convolution: 1x1 conv to C*r^2 + BN + ReLU +
    PixelShuffle(r). Parity: reference models/duc_hdc.py:15-49."""

    features: int
    upscale: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        r = self.upscale
        y = Conv(self.features * r * r, 1, use_bias=False,
                 kernel_init=_icnr_init(r), name="conv")(x)
        y = BatchNorm(name="bn")(y, use_running_average=not train)
        y = nn.relu(y)
        return pixel_shuffle(y, r)
