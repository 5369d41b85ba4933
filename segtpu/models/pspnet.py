"""PSPNet with a dilated-ResNet backbone, plus the DenseNet variant.

Parity targets: reference models/pspnet.py — PSPNet (:41-105) with
_PSPModule bins [1,2,3,6] (:11-38), aux head from layer3 (:64-70), train-mode
aux output (:89-93), final bilinear upsample WITHOUT align_corners (:86);
PSPDenseNet (:117-205).

This is the benchmark flagship (reference README.md:130-134: VOC val 82%
with ResNet-50).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from segtpu.backbones.resnet import ResNetFeatures
from segtpu.backbones.densenet import DenseNetFeatures
from segtpu.nn.blocks import PSPModule
from segtpu.nn.layers import BatchNorm, Conv, kaiming_normal_init
from segtpu.ops.resize import resize_bilinear


def _bias_fill_init(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


class _AuxBranch(nn.Module):
    """conv3x3 -> BN -> ReLU -> dropout(0.1) -> 1x1 classifier
    (reference models/pspnet.py:64-70)."""

    mid_features: int
    num_classes: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = Conv(self.mid_features, 3, padding=1, use_bias=False,
                 kernel_init=kaiming_normal_init, name="conv")(x)
        x = BatchNorm(name="bn")(x, use_running_average=not train)
        x = nn.relu(x)
        x = nn.Dropout(0.1, deterministic=not train)(x)
        return Conv(self.num_classes, 1, kernel_init=kaiming_normal_init,
                    bias_init=_bias_fill_init, name="classifier")(x)


class PSPNet(nn.Module):
    num_classes: int
    in_channels: int = 3
    backbone: str = "resnet152"
    pretrained: bool = False
    use_aux: bool = True
    freeze_bn: bool = False
    freeze_backbone: bool = False
    remat_backbone: bool = False  # per-block remat: bigger batches/crops
    pallas_stem_wgrad: bool = False  # Pallas wgrad for the first stem conv
    s2d_stem: bool = False  # first stem conv in space-to-depth layout

    @nn.compact
    def __call__(self, x, train: bool = True):
        bn_train = train and not self.freeze_bn
        H, W = x.shape[1], x.shape[2]
        feats = ResNetFeatures(arch=self.backbone, style="encoding",
                               remat_blocks=self.remat_backbone,
                               pallas_stem_wgrad=self.pallas_stem_wgrad,
                               s2d_stem=self.s2d_stem,
                               name="backbone")(x, train=bn_train)
        x_aux, y = feats[2], feats[3]
        m_out = y.shape[-1]

        y = PSPModule(bin_sizes=(1, 2, 3, 6), name="psp")(y, train=bn_train)
        y = Conv(self.num_classes, 1, kernel_init=kaiming_normal_init,
                 bias_init=_bias_fill_init, name="classifier")(y)
        out = resize_bilinear(y, (H, W), align_corners=False)

        result = {"out": out}
        # The aux branch only contributes during training (reference
        # models/pspnet.py:89-93), but its params must exist regardless of the
        # init-time train flag.
        if self.use_aux and (train or self.is_initializing()):
            aux = _AuxBranch(m_out // 4, self.num_classes,
                             name="aux_branch")(x_aux, train=bn_train)
            if train:
                result["aux"] = resize_bilinear(aux, (H, W), align_corners=False)
        return result


class PSPDenseNet(nn.Module):
    """PSP head on a DenseNet-201 backbone with dilation surgery on blocks 3/4
    (reference models/pspnet.py:117-205). ``pretrained=False`` uses the
    3x3-conv stem variant (reference :125-135)."""

    num_classes: int
    in_channels: int = 3
    backbone: str = "densenet201"
    pretrained: bool = False
    use_aux: bool = True
    freeze_bn: bool = False
    remat_backbone: bool = False  # per-dense-layer remat: restores bs8 @769²

    @nn.compact
    def __call__(self, x, train: bool = True):
        bn_train = train and not self.freeze_bn
        H, W = x.shape[1], x.shape[2]
        y, x_aux = DenseNetFeatures(arch=self.backbone,
                                    pretrained_stem=self.pretrained,
                                    remat_layers=self.remat_backbone,
                                    name="backbone")(x, train=bn_train)
        m_out = y.shape[-1]

        y = PSPModule(bin_sizes=(1, 2, 3, 6), name="psp")(y, train=bn_train)
        y = Conv(self.num_classes, 1, kernel_init=kaiming_normal_init,
                 bias_init=_bias_fill_init, name="classifier")(y)
        out = resize_bilinear(y, (H, W), align_corners=False)

        result = {"out": out}
        if self.use_aux and (train or self.is_initializing()):
            aux = _AuxBranch(m_out // 4, self.num_classes,
                             name="aux_branch")(x_aux, train=bn_train)
            if train:
                result["aux"] = resize_bilinear(aux, (H, W), align_corners=False)
        return result
