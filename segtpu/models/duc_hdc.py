"""DeepLab with Dense Upsampling Convolution + Hybrid Dilated Convolution.

Parity target: reference models/duc_hdc.py:214-244 — ResNet-101 backbone with
HDC dilation plans d=[1,2,3]*7+[2,2] / [3,4,5] (or the 'bigger' variants,
:78-103), 6-branch ASPP (:126-174), decoder with DUC(x2) + 48-ch low-level
projection (:180-208), and a final DUC(x4) head (:223,233).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from segtpu.backbones.resnet import ResNetFeatures
from segtpu.nn.blocks import ASPP, DUC
from segtpu.nn.layers import BatchNorm, Conv, kaiming_normal_init


def _zero_bias(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


class DUCDecoder(nn.Module):
    """DUC(x2) on the ASPP output + low-level fusion
    (reference models/duc_hdc.py:180-208)."""

    num_classes: int

    @nn.compact
    def __call__(self, x, low_level, train: bool = True):
        ll = Conv(48, 1, use_bias=False, kernel_init=kaiming_normal_init,
                  name="ll_conv")(low_level)
        ll = BatchNorm(name="ll_bn")(ll, use_running_average=not train)
        ll = nn.relu(ll)
        x = DUC(256, upscale=2, name="duc")(x, train=train)
        if x.shape[1:3] != ll.shape[1:3]:
            x = x[:, : ll.shape[1], : ll.shape[2], :]
        y = jnp.concatenate([ll, x], axis=-1)
        for i in range(2):
            y = Conv(256, 3, padding=1, use_bias=False,
                     kernel_init=kaiming_normal_init, name=f"conv{i + 1}")(y)
            y = BatchNorm(name=f"bn{i + 1}")(y, use_running_average=not train)
            y = nn.relu(y)
        y = nn.Dropout(0.1, deterministic=not train)(y)
        return Conv(self.num_classes, 1, kernel_init=kaiming_normal_init,
                    bias_init=_zero_bias, name="classifier")(y)


class DeepLab_DUC_HDC(nn.Module):
    num_classes: int
    in_channels: int = 3
    backbone: str = "resnet101"
    pretrained: bool = False
    output_stride: int = 8
    dilation_bigger: bool = False
    freeze_bn: bool = False
    freeze_backbone: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        bn_train = train and not self.freeze_bn
        feats = ResNetFeatures(
            arch=self.backbone, style="torchvision",
            hdc="bigger" if self.dilation_bigger else "rf",
            stem_stride=1 if self.output_stride == 4 else 2,
            name="backbone")(x, train=bn_train)
        low_level, y = feats[0], feats[3]
        y = ASPP(output_stride=self.output_stride, num_branches=6,
                 name="aspp")(y, train=bn_train)
        y = DUCDecoder(self.num_classes, name="decoder")(y, low_level,
                                                         train=bn_train)
        out = DUC(self.num_classes, upscale=4, name="duc_out")(y, train=bn_train)
        # odd inputs: the 4x pixel-shuffle overshoots by up to 3 px (the
        # reference returns the oversized map and would fail the loss shape
        # check upstream — latent bug); crop to the input extent
        if out.shape[1] != x.shape[1] or out.shape[2] != x.shape[2]:
            out = out[:, : x.shape[1], : x.shape[2], :]
        return {"out": out}
