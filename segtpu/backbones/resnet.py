"""Configurable ResNet feature extractor (NHWC, Flax).

One implementation serves every ResNet appearance in the reference zoo:

* PyTorch-Encoding "dilated ResNet" with deep-base 3x3 stem, stride-8
  layer3/4 dilation, optional multi-grid [4, 8, 16]
  (reference models/resnet.py:124-229) — used by PSPNet, UNetResnet, GCN.
* torchvision ResNet with output-stride 8/16 stride/dilation surgery on
  layer3/4 (reference models/deeplabv3_plus.py:35-53, models/upernet.py:60-78)
  — used by DeepLab-resnet, UperNet.
* Hybrid Dilated Convolution schedules d=[1,2,3]*7+[2,2] / [3,4,5] (or the
  "bigger" variants) (reference models/duc_hdc.py:78-103) — DeepLab_DUC_HDC.

Instead of post-hoc module surgery (mutating .stride/.dilation on built
modules, as torch allows), the dilation plan is computed up front as explicit
per-block lists — the JAX-native formulation: configuration in, static graph
out.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from segtpu.nn.layers import BatchNorm, Conv
from segtpu.ops.pooling import max_pool

RESNET_LAYERS = {
    "resnet18": ("basic", (2, 2, 2, 2)),
    "resnet34": ("basic", (3, 4, 6, 3)),
    "resnet50": ("bottleneck", (3, 4, 6, 3)),
    "resnet101": ("bottleneck", (3, 4, 23, 3)),
    "resnet152": ("bottleneck", (3, 8, 36, 3)),
}


def _he_fanout_init(key, shape, dtype=jnp.float32):
    """Reference models/resnet.py:172-175: N(0, sqrt(2/(k*k*out)))."""
    import jax

    fan_out = shape[0] * shape[1] * shape[3]
    return jax.random.normal(key, shape, dtype) * jnp.sqrt(2.0 / fan_out)


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dilation1: int = 1
    dilation2: int = 1
    has_downsample: bool = False
    downsample_stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        residual = x
        y = Conv(self.features, 3, self.stride, padding=self.dilation1,
                 dilation=self.dilation1, use_bias=False,
                 kernel_init=_he_fanout_init, name="conv1")(x)
        y = BatchNorm(name="bn1")(y, use_running_average=not train)
        y = nn.relu(y)
        y = Conv(self.features, 3, 1, padding=self.dilation2,
                 dilation=self.dilation2, use_bias=False,
                 kernel_init=_he_fanout_init, name="conv2")(y)
        y = BatchNorm(name="bn2")(y, use_running_average=not train)
        if self.has_downsample:
            residual = Conv(self.features, 1, self.downsample_stride,
                            use_bias=False, kernel_init=_he_fanout_init,
                            name="downsample_conv")(x)
            residual = BatchNorm(name="downsample_bn")(
                residual, use_running_average=not train)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output is 4x
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    downsample_stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        residual = x
        y = Conv(self.features, 1, use_bias=False,
                 kernel_init=_he_fanout_init, name="conv1")(x)
        y = BatchNorm(name="bn1")(y, use_running_average=not train)
        y = nn.relu(y)
        y = Conv(self.features, 3, self.stride, padding=self.dilation,
                 dilation=self.dilation, use_bias=False,
                 kernel_init=_he_fanout_init, name="conv2")(y)
        y = BatchNorm(name="bn2")(y, use_running_average=not train)
        y = nn.relu(y)
        y = Conv(self.features * 4, 1, use_bias=False,
                 kernel_init=_he_fanout_init, name="conv3")(y)
        y = BatchNorm(name="bn3")(y, use_running_average=not train)
        if self.has_downsample:
            residual = Conv(self.features * 4, 1, self.downsample_stride,
                            use_bias=False, kernel_init=_he_fanout_init,
                            name="downsample_conv")(x)
            residual = BatchNorm(name="downsample_bn")(
                residual, use_running_average=not train)
        return nn.relu(y + residual)


def _layer_plan(
    arch: str,
    style: str,
    output_stride: int,
    multi_grid: bool,
    hdc: Optional[str],
) -> Tuple[Tuple[int, ...], list]:
    """Compute (per-layer first-block stride, per-layer per-block dilation
    lists) matching the reference's module surgeries exactly."""
    block_kind, counts = RESNET_LAYERS[arch]
    strides = [1, 2, 2, 2]
    dil = [[1] * c for c in counts]

    if hdc is not None:
        # reference models/duc_hdc.py:76-103 (resnet101 only in practice)
        strides[2] = strides[3] = 1
        if hdc == "bigger":
            d3 = ([1, 2, 5, 9] * 5 + [1, 2, 5])[: counts[2]]
            d4 = [5, 9, 17][: counts[3]]
        else:
            d3 = ([1, 2, 3] * 7 + [2, 2])[: counts[2]]
            d4 = [3, 4, 5][: counts[3]]
        dil[2], dil[3] = list(d3), list(d4)
    elif style == "encoding":
        # reference models/resnet.py:154-211: stride 8, first-block dilation
        # halved relative to the rest; multi-grid [4,8,16] on layer4.
        strides[2] = strides[3] = 1
        dil[2] = [1] + [2] * (counts[2] - 1)
        if multi_grid:
            md = [4, 8, 16]
            dil[3] = [md[min(i, 2)] for i in range(counts[3])]
        else:
            dil[3] = [2] + [4] * (counts[3] - 1)
    else:  # torchvision surgery, reference models/deeplabv3_plus.py:35-53
        if output_stride == 32:
            s3, s4, d3, d4 = 2, 2, 1, 1  # stock torchvision, no surgery
        elif output_stride == 16:
            s3, s4, d3, d4 = 2, 1, 1, 2
        elif output_stride == 8:
            s3, s4, d3, d4 = 1, 1, 2, 4
        else:
            raise ValueError(f"unsupported output_stride {output_stride}")
        strides[2], strides[3] = s3, s4
        dil[2] = [d3] * counts[2]
        dil[3] = [d4] * counts[3]
    return tuple(strides), dil


class _PallasStemConv(nn.Module):
    """Stride-2 bias-free stem conv whose weight gradient is the Pallas
    space-to-depth wgrad kernel. Same param name/shape/init as the plain
    Conv it replaces, so checkpoints and TP sharding trees are unaffected."""

    features: int
    kernel_size: int

    @nn.compact
    def __call__(self, x):
        from segtpu.ops.conv_wgrad import pallas_stem_conv

        k = self.kernel_size
        kern = self.param("kernel", _he_fanout_init,
                          (k, k, x.shape[-1], self.features))
        return pallas_stem_conv(x, kern, k)


class _S2DStemConv(nn.Module):
    """Stride-2 bias-free stem conv computed in space-to-depth layout
    (ops/s2d.py): stride-1, 4x channels, 1/4 positions — same arithmetic,
    shapes XLA's forward AND weight-gradient emitters can tile. Same param
    name/shape/init as the plain Conv it replaces, so checkpoints, the
    torch converters, and TP sharding trees are unaffected."""

    features: int
    kernel_size: int

    @nn.compact
    def __call__(self, x):
        from segtpu.ops.s2d import s2d_stem_conv

        k = self.kernel_size
        kern = self.param("kernel", _he_fanout_init,
                          (k, k, x.shape[-1], self.features))
        return s2d_stem_conv(x, kern, padding=k // 2)


class ResNetFeatures(nn.Module):
    """ResNet encoder returning the four stage feature maps.

    ``style``:
      * ``'encoding'`` — deep-base 3x3 stem (128-ch), stride-8 dilated
        layer3/4 (reference models/resnet.py). ``deep_base`` only applies to
        bottleneck variants, matching upstream resnet18/34 (deep_base=False).
      * ``'torchvision'`` — 7x7 stem, ``output_stride`` 8/16/32 surgery.

    ``hdc`` in {None, 'rf', 'bigger'} selects the Hybrid Dilated Conv plans.
    ``stem_stride=1`` reproduces duc_hdc's output_stride=4 trick
    (reference models/duc_hdc.py:76).
    """

    arch: str = "resnet50"
    style: str = "torchvision"
    output_stride: int = 32
    multi_grid: bool = False
    hdc: Optional[str] = None
    in_features_stem: int = 64
    stem_stride: int = 2
    dilate_only_last: bool = False
    # Rematerialize each residual block during backprop: peak activation
    # memory drops to roughly one block's working set for ~1/3 extra FLOPs —
    # the per-block granularity jax.checkpoint can't get from outside the
    # model (whole-function remat measured a net loss, CLAUDE.md).
    remat_blocks: bool = False
    # Route the FIRST stem conv's weight gradient through the Pallas
    # space-to-depth wgrad kernel (ops/conv_wgrad.py) — the small-C stride-2
    # wgrad is the one shape XLA's emitter handles worst (README roofline).
    # Only valid when this backbone consumes the MODEL INPUT directly (the
    # kernel returns a zero input-cotangent, dead code for data).
    pallas_stem_wgrad: bool = False
    # Compute the first stem conv in space-to-depth layout (ops/s2d.py):
    # graph-level relayout, exact same arithmetic, no custom kernel. Aims at
    # the identical small-C stride-2 bucket as pallas_stem_wgrad but pays
    # zero per-step gradient relayout (the s2d rides the input).
    s2d_stem: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        block_kind, counts = RESNET_LAYERS[self.arch]
        deep_base = self.style == "encoding" and block_kind == "bottleneck"
        strides, dils = _layer_plan(self.arch, self.style, self.output_stride,
                                    self.multi_grid, self.hdc)

        use_pallas_stem = self.pallas_stem_wgrad and self.stem_stride == 2
        use_s2d_stem = (self.s2d_stem and self.stem_stride == 2
                        and not use_pallas_stem)

        # Stem
        if deep_base:
            if use_pallas_stem:
                y = _PallasStemConv(64, 3, name="stem_conv1")(x)
            elif use_s2d_stem:
                y = _S2DStemConv(64, 3, name="stem_conv1")(x)
            else:
                y = Conv(64, 3, self.stem_stride, 1, use_bias=False,
                         kernel_init=_he_fanout_init, name="stem_conv1")(x)
            y = BatchNorm(name="stem_bn1")(y, use_running_average=not train)
            y = nn.relu(y)
            y = Conv(64, 3, 1, 1, use_bias=False,
                     kernel_init=_he_fanout_init, name="stem_conv2")(y)
            y = BatchNorm(name="stem_bn2")(y, use_running_average=not train)
            y = nn.relu(y)
            y = Conv(128, 3, 1, 1, use_bias=False,
                     kernel_init=_he_fanout_init, name="stem_conv3")(y)
        else:
            if use_pallas_stem:
                y = _PallasStemConv(64, 7, name="stem_conv1")(x)
            elif use_s2d_stem:
                y = _S2DStemConv(64, 7, name="stem_conv1")(x)
            else:
                y = Conv(64, 7, self.stem_stride, 3, use_bias=False,
                         kernel_init=_he_fanout_init, name="stem_conv1")(x)
        y = BatchNorm(name="stem_bn")(y, use_running_average=not train)
        y = nn.relu(y)
        y = max_pool(y, 3, 2, padding=1)

        widths = (64, 128, 256, 512)
        feats = []
        in_planes = 128 if deep_base else 64
        bottleneck_cls = (nn.remat(Bottleneck, static_argnums=(2,))
                          if self.remat_blocks else Bottleneck)
        basic_cls = (nn.remat(BasicBlock, static_argnums=(2,))
                     if self.remat_blocks else BasicBlock)
        for li in range(4):
            planes = widths[li]
            out_planes = planes * (4 if block_kind == "bottleneck" else 1)
            for bi in range(counts[li]):
                stride = strides[li] if bi == 0 else 1
                needs_ds = bi == 0 and (stride != 1 or in_planes != out_planes)
                if block_kind == "bottleneck":
                    y = bottleneck_cls(planes, stride, dils[li][bi],
                                       has_downsample=needs_ds,
                                       downsample_stride=stride,
                                       name=f"layer{li + 1}_{bi}")(y, train)
                else:
                    # BasicBlock: conv1 carries the block dilation, conv2 the
                    # layer's nominal dilation (reference models/resnet.py:43-48
                    # previous_dilation). For torchvision surgery both convs
                    # get the same d (reference models/deeplabv3_plus.py:40-43).
                    d1 = dils[li][bi]
                    d2 = max(dils[li]) if self.style == "encoding" else d1
                    y = basic_cls(planes, stride, d1, d2,
                                  has_downsample=needs_ds,
                                  downsample_stride=stride,
                                  name=f"layer{li + 1}_{bi}")(y, train)
                in_planes = out_planes
            feats.append(y)
        return feats
