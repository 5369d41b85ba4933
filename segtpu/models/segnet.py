"""SegNet (VGG16-BN, unpooling decoder) and SegResNet (ResNet-50 encoder).

Parity targets: reference models/segnet.py — SegNet (:13-132): VGG16-BN
encoder split at the maxpools, pool indices saved, decoder = mirrored VGG
with MaxUnpool2d; SegResNet (:200-277): ResNet-50 encoder with
return_indices on the stem pool, mirror-reversed untrained resnet blocks +
DecoderBottleneck/LastBottleneck transpose-conv decoder, crop epilogue.

MaxUnpool has no XLA primitive; segtpu.ops.max_pool_argmax/max_unpool express
it as a static one-hot expand (see ops/pooling.py).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from segtpu.backbones.vgg import VGG16BNEncoderWithIndices
from segtpu.nn.layers import BatchNorm, Conv, ConvTranspose, kaiming_normal_init
from segtpu.ops.pooling import (max_pool_argmax, max_pool_argmax_flat,
                                max_unpool, max_unpool_flat)


def _zero_bias(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


class _DecoderStage(nn.Module):
    """(conv3x3 + BN + ReLU) x len(widths) (reference models/segnet.py:37-61:
    the mirrored-VGG decoder stages after the conv/BN order fix)."""

    widths: Tuple[int, ...]

    @nn.compact
    def __call__(self, x, train: bool = True):
        for i, w in enumerate(self.widths):
            x = Conv(w, 3, padding=1, kernel_init=kaiming_normal_init,
                     bias_init=_zero_bias, name=f"conv{i}")(x)
            x = BatchNorm(name=f"bn{i}")(x, use_running_average=not train)
            x = nn.relu(x)
        return x


class SegNet(nn.Module):
    num_classes: int
    in_channels: int = 3
    pretrained: bool = False
    freeze_bn: bool = False
    freeze_backbone: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        bn_train = train and not self.freeze_bn
        y, saved = VGG16BNEncoderWithIndices(name="backbone")(x, train=bn_train)

        # Mirror of the encoder: stage widths are the reversed VGG stages with
        # the channel step moved to the LAST conv of each decoder stage.
        decoder_widths = ((512, 512, 512), (512, 512, 256), (256, 256, 128),
                          (128, 64), (64, 64))
        for si, widths in enumerate(decoder_widths):
            idx, pre_hw = saved[len(saved) - 1 - si]
            y = max_unpool(y, idx, output_size=pre_hw)
            y = _DecoderStage(widths, name=f"decoder{si + 1}")(y, train=bn_train)
        out = Conv(self.num_classes, 3, padding=1,
                   kernel_init=kaiming_normal_init, bias_init=_zero_bias,
                   name="classifier")(y)
        return {"out": out}


class _DecoderBottleneck(nn.Module):
    """1x1 reduce -> ConvTranspose(2,2) -> 1x1 expand to in//2, with a
    transpose-conv shortcut (reference models/segnet.py:135-165)."""

    in_features: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        mid = self.in_features // 4
        out = self.in_features // 2
        y = Conv(mid, 1, use_bias=False, name="conv1")(x)
        y = BatchNorm(name="bn1")(y, use_running_average=not train)
        y = nn.relu(y)
        y = ConvTranspose(mid, 2, 2, use_bias=False, name="conv2")(y)
        y = BatchNorm(name="bn2")(y, use_running_average=not train)
        y = nn.relu(y)
        y = Conv(out, 1, use_bias=False, name="conv3")(y)
        y = BatchNorm(name="bn3")(y, use_running_average=not train)
        sc = ConvTranspose(out, 2, 2, use_bias=False, name="shortcut_conv")(x)
        sc = BatchNorm(name="shortcut_bn")(sc, use_running_average=not train)
        return nn.relu(y + sc)


class _LastBottleneck(nn.Module):
    """Final 256 -> 64 bottleneck (reference models/segnet.py:168-197)."""

    in_features: int = 256

    @nn.compact
    def __call__(self, x, train: bool = True):
        mid = self.in_features // 4
        y = Conv(mid, 1, use_bias=False, name="conv1")(x)
        y = BatchNorm(name="bn1")(y, use_running_average=not train)
        y = nn.relu(y)
        y = Conv(mid, 3, padding=1, use_bias=False, name="conv2")(y)
        y = BatchNorm(name="bn2")(y, use_running_average=not train)
        y = nn.relu(y)
        y = Conv(mid, 1, use_bias=False, name="conv3")(y)
        y = BatchNorm(name="bn3")(y, use_running_average=not train)
        sc = Conv(mid, 1, use_bias=False, name="shortcut_conv")(x)
        sc = BatchNorm(name="shortcut_bn")(sc, use_running_average=not train)
        return nn.relu(y + sc)


class _ResNet50Bottleneck(nn.Module):
    """Plain (non-dilated) torchvision bottleneck used by both the SegResNet
    encoder stages and the mirrored decoder stages."""

    features: int
    stride: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        residual = x
        y = Conv(self.features, 1, use_bias=False, name="conv1")(x)
        y = BatchNorm(name="bn1")(y, use_running_average=not train)
        y = nn.relu(y)
        y = Conv(self.features, 3, self.stride, 1, use_bias=False, name="conv2")(y)
        y = BatchNorm(name="bn2")(y, use_running_average=not train)
        y = nn.relu(y)
        y = Conv(self.features * 4, 1, use_bias=False, name="conv3")(y)
        y = BatchNorm(name="bn3")(y, use_running_average=not train)
        if self.has_downsample:
            residual = Conv(self.features * 4, 1, self.stride, use_bias=False,
                            name="downsample_conv")(x)
            residual = BatchNorm(name="downsample_bn")(
                residual, use_running_average=not train)
        return nn.relu(y + residual)


class SegResNet(nn.Module):
    """ResNet-50 encoder (stem pool keeps argmax indices) + mirrored decoder.

    The reference decoder reverses untrained resnet50 block lists, drops each
    stage's first (downsampling) block, and appends a DecoderBottleneck
    (reference models/segnet.py:216-231). Stage block counts mirror
    resnet50's [3,4,6,3] minus the dropped head block.
    """

    num_classes: int
    in_channels: int = 3
    pretrained: bool = False
    freeze_bn: bool = False
    freeze_backbone: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        bn_train = train and not self.freeze_bn
        H, W = x.shape[1], x.shape[2]

        # Encoder stem with indices — torchvision's 3x3/s2/p1 pool with
        # return_indices, reproduced exactly (flat per-channel argmax
        # positions, ops/pooling.py::max_pool_argmax_flat)
        y = Conv(64, 7, 2, 3, use_bias=False, name="backbone_stem_conv")(x)
        y = BatchNorm(name="backbone_stem_bn")(y, use_running_average=not bn_train)
        y = nn.relu(y)
        pool_hw = (y.shape[1], y.shape[2])  # idx flat positions refer here
        y, idx = max_pool_argmax_flat(y, window=3, stride=2, padding=1)

        counts = (3, 4, 6, 3)
        widths = (64, 128, 256, 512)
        for li in range(4):
            for bi in range(counts[li]):
                stride = 2 if (li > 0 and bi == 0) else 1
                needs_ds = bi == 0
                y = _ResNet50Bottleneck(widths[li], stride, needs_ds,
                                        name=f"backbone_layer{li + 1}_{bi}")(
                    y, train=bn_train)

        # Decoder: reversed stages; each stage = (count-1) same-width
        # bottlenecks + a DecoderBottleneck halving channels and doubling HW.
        # Counts mirror resnet50's [3,4,6,3] minus the dropped (downsampling)
        # head block of each reversed layer: layer4->2, layer3->5, layer2->3
        # (reference models/segnet.py:216-224).
        dec_plan = ((512, 2), (256, 5), (128, 3))  # width, repeated blocks
        for si, (w, reps) in enumerate(dec_plan):
            for bi in range(reps):
                y = _ResNet50Bottleneck(w, 1, False,
                                        name=f"decoder{si + 1}_{bi}")(y, train=bn_train)
            y = _DecoderBottleneck(w * 4, name=f"decoder{si + 1}_up")(y, train=bn_train)
        for bi in range(2):
            y = _ResNet50Bottleneck(64, 1, False,
                                    name=f"decoder4_{bi}")(y, train=bn_train)
        y = _LastBottleneck(256, name="decoder4_last")(y, train=bn_train)

        # Reference-exact epilogue (models/segnet.py:240-262): ceil-crop the
        # decoder output to the pooled grid, unpool to 2x via the saved flat
        # indices, ConvTranspose + classifier, center-crop to the input.
        ih, iw = idx.shape[1], idx.shape[2]
        yh, yw = y.shape[1], y.shape[2]
        hd = -(-(yh - ih) // 2)
        wd = -(-(yw - iw) // 2)
        if (yh, yw) != (ih, iw):
            if ih % 2 == 1:
                y = y[:, hd:yh - (hd - 1), wd:yw - (wd - 1)]
            else:
                y = y[:, hd:yh - hd, wd:yw - wd]
        y = max_unpool_flat(y, idx, (2 * ih, 2 * iw), input_hw=pool_hw)
        y = ConvTranspose(64, 2, 2, use_bias=False, name="last_up")(y)
        out = Conv(self.num_classes, 3, padding=1, name="classifier")(y)
        if out.shape[1] != H or out.shape[2] != W:
            hd = (out.shape[1] - H) // 2
            wd = (out.shape[2] - W) // 2
            out = out[:, hd:out.shape[1] - hd, wd:out.shape[2] - wd]
            if hd % 2 != 0:
                out = out[:, :-1]
            if wd % 2 != 0:
                out = out[:, :, :-1]
        return {"out": out}
