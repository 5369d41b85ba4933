"""DeepLabV3+ with ResNet or Aligned-Xception backbone.

Parity target: reference models/deeplabv3_plus.py:336-377 (DeepLab) — ASPP
over the 2048-ch backbone output (:260-297), decoder with 48-ch low-level
projection and two 3x3 convs (:303-330), final x4 bilinear upsample
(align_corners=True, :356-362). ResNet low-level tap is layer1 (256 ch),
Xception's is block1 (128 ch).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from segtpu.backbones.resnet import ResNetFeatures
from segtpu.backbones.xception import XceptionFeatures
from segtpu.nn.blocks import ASPP
from segtpu.nn.layers import BatchNorm, Conv, kaiming_normal_init
from segtpu.ops.resize import resize_bilinear


def _zero_bias(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


class DeepLabDecoder(nn.Module):
    """48-ch low-level projection + two 3x3 convs + dropout + classifier
    (reference models/deeplabv3_plus.py:303-330)."""

    num_classes: int

    @nn.compact
    def __call__(self, x, low_level, train: bool = True):
        ll = Conv(48, 1, use_bias=False, kernel_init=kaiming_normal_init,
                  name="ll_conv")(low_level)
        ll = BatchNorm(name="ll_bn")(ll, use_running_average=not train)
        ll = nn.relu(ll)
        x = resize_bilinear(x, (ll.shape[1], ll.shape[2]), align_corners=True)
        y = jnp.concatenate([ll, x], axis=-1)
        for i in range(2):
            y = Conv(256, 3, padding=1, use_bias=False,
                     kernel_init=kaiming_normal_init, name=f"conv{i + 1}")(y)
            y = BatchNorm(name=f"bn{i + 1}")(y, use_running_average=not train)
            y = nn.relu(y)
        y = nn.Dropout(0.1, deterministic=not train)(y)
        return Conv(self.num_classes, 1, kernel_init=kaiming_normal_init,
                    bias_init=_zero_bias, name="classifier")(y)


class DeepLab(nn.Module):
    num_classes: int
    in_channels: int = 3
    backbone: str = "xception"
    pretrained: bool = False
    output_stride: int = 16
    freeze_bn: bool = False
    freeze_backbone: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        bn_train = train and not self.freeze_bn
        H, W = x.shape[1], x.shape[2]
        if "resnet" in self.backbone:
            feats = ResNetFeatures(arch=self.backbone, style="torchvision",
                                   output_stride=self.output_stride,
                                   name="backbone")(x, train=bn_train)
            low_level, y = feats[0], feats[3]
        else:
            y, low_level = XceptionFeatures(output_stride=self.output_stride,
                                            name="backbone")(x, train=bn_train)

        y = ASPP(output_stride=self.output_stride, num_branches=4,
                 name="aspp")(y, train=bn_train)
        y = DeepLabDecoder(self.num_classes, name="decoder")(
            y, low_level, train=bn_train)
        out = resize_bilinear(y, (H, W), align_corners=True)
        return {"out": out}
