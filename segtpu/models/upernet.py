"""UperNet: FPN decode over the four ResNet stages + PSP on the last.

Parity target: reference models/upernet.py:119-154 — torchvision ResNet
backbone at output-stride 16 by default (layer4 dilated; output_stride=8
additionally dilates layer3, reference models/upernet.py:60-76),
PSPModule with bins [1,2,4,6] whose bottleneck keeps the input width
(:12-38), FPN_fuse to fpn_out=256 (:92-117), 3x3 classifier head, final
bilinear upsample WITHOUT align_corners (:143).
"""

from __future__ import annotations

import flax.linen as nn

from segtpu.backbones.resnet import ResNetFeatures
from segtpu.nn.blocks import FPNFuse, PSPModule
from segtpu.nn.layers import Conv, kaiming_normal_init
from segtpu.ops.resize import resize_bilinear


class UperNet(nn.Module):
    num_classes: int
    in_channels: int = 3
    backbone: str = "resnet101"
    pretrained: bool = False
    use_aux: bool = True  # accepted for config parity; object path only
    fpn_out: int = 256
    freeze_bn: bool = False
    freeze_backbone: bool = False
    output_stride: int = 16

    @nn.compact
    def __call__(self, x, train: bool = True):
        bn_train = train and not self.freeze_bn
        H, W = x.shape[1], x.shape[2]
        feats = ResNetFeatures(arch=self.backbone, style="torchvision",
                               output_stride=self.output_stride,
                               name="backbone")(x, train=bn_train)
        feats = list(feats)
        feats[-1] = PSPModule(bin_sizes=(1, 2, 4, 6),
                              out_features=feats[-1].shape[-1],
                              name="ppn")(feats[-1], train=bn_train)
        y = FPNFuse(fpn_out=self.fpn_out, name="fpn")(feats, train=bn_train)
        y = Conv(self.num_classes, 3, padding=1,
                 kernel_init=kaiming_normal_init, name="head")(y)
        out = resize_bilinear(y, (H, W), align_corners=False)
        return {"out": out}
