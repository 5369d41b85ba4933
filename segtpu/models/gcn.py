"""GCN — Global Convolutional Network (large-kernel segmentation).

Parity target: reference models/gcn.py — GCN_Block separable kx1+1xk dual
path (:147-170), BR_Block boundary refinement (:172-189, conv-relu-conv
residual as actually executed at :187), FPN-ish top-down fusion with
interpolate or deconv paths (:235-260), ResNet or ResnetGCN backbone
(:78-141).

Divergences from upstream (documented): the reference's ResnetGCN layer4
repeats one shared-weight BottleneckGCN(1024,1024) over a 2048-ch input —
a latent crash upstream (models/gcn.py:96-98); here layer4 blocks are
independent and channel-consistent (2048).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from segtpu.backbones.resnet import ResNetFeatures
from segtpu.nn.layers import BatchNorm, Conv, ConvTranspose, kaiming_normal_init
from segtpu.ops.pooling import max_pool
from segtpu.ops.resize import resize_bilinear


def _zero_bias(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


class GCNBlock(nn.Module):
    """(kx1 -> 1xk) + (1xk -> kx1) dual path (reference models/gcn.py:147-170)."""

    kernel_size: int
    features: int

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        p = k // 2
        a = Conv(self.features, (k, 1), padding=(p, 0),
                 kernel_init=kaiming_normal_init, name="conv11")(x)
        a = Conv(self.features, (1, k), padding=(0, p),
                 kernel_init=kaiming_normal_init, name="conv12")(a)
        b = Conv(self.features, (1, k), padding=(0, p),
                 kernel_init=kaiming_normal_init, name="conv21")(x)
        b = Conv(self.features, (k, 1), padding=(p, 0),
                 kernel_init=kaiming_normal_init, name="conv22")(b)
        return a + b


class BRBlock(nn.Module):
    """Boundary refinement: x + conv(relu(conv(x)))
    (reference models/gcn.py:183-189 as executed)."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = Conv(c, 3, padding=1, kernel_init=kaiming_normal_init,
                 name="conv1")(x)
        y = Conv(c, 3, padding=1, kernel_init=kaiming_normal_init,
                 name="conv2")(nn.relu(y))
        return x + y


class BlockResnetGCN(nn.Module):
    """GCN residual block with BN+ReLU between the separable convs
    (reference models/gcn.py:13-51)."""

    kernel_size: int
    features: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        k, p = self.kernel_size, self.kernel_size // 2

        def path(first_k, first_p, second_k, second_p, tag):
            y = Conv(self.features, first_k, padding=first_p, use_bias=False,
                     kernel_init=kaiming_normal_init, name=f"conv{tag}1")(x)
            y = BatchNorm(name=f"bn{tag}1")(y, use_running_average=not train)
            y = nn.relu(y)
            y = Conv(self.features, second_k, padding=second_p, use_bias=False,
                     kernel_init=kaiming_normal_init, name=f"conv{tag}2")(y)
            y = BatchNorm(name=f"bn{tag}2")(y, use_running_average=not train)
            return nn.relu(y)

        a = path((k, 1), (p, 0), (1, k), (0, p), "1")
        b = path((1, k), (0, p), (k, 1), (p, 0), "2")
        return a + b


class BottleneckGCN(nn.Module):
    """GCN bottleneck with 1x1 projection and strided shortcut
    (reference models/gcn.py:53-76)."""

    features: int
    kernel_size: int
    gcn_features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        identity = x
        if x.shape[-1] != self.features or self.stride != 1:
            identity = Conv(self.features, 1, self.stride,
                            kernel_init=kaiming_normal_init,
                            name="downsample_conv")(x)
            identity = BatchNorm(name="downsample_bn")(
                identity, use_running_average=not train)
        y = BlockResnetGCN(self.kernel_size, self.gcn_features,
                           name="gcn")(x, train=train)
        y = Conv(self.features, 1, self.stride, use_bias=False,
                 kernel_init=kaiming_normal_init, name="conv1x1")(y)
        y = BatchNorm(name="bn1x1")(y, use_running_average=not train)
        return y + identity


class _ResnetGCNBackbone(nn.Module):
    """ResNet stem + layer1/2 with GCN-bottleneck layer3/4
    (reference models/gcn.py:78-108)."""

    backbone: str = "resnet50"
    gcn_features: tuple = (85, 128)
    kernel_sizes: tuple = (5, 7)

    @nn.compact
    def __call__(self, x, train: bool = True):
        from segtpu.backbones.resnet import RESNET_LAYERS, Bottleneck, BasicBlock
        from segtpu.backbones.resnet import _he_fanout_init

        block_kind, counts = RESNET_LAYERS[self.backbone]
        y = Conv(64, 7, 2, 3, use_bias=False, kernel_init=_he_fanout_init,
                 name="stem_conv1")(x)
        y = BatchNorm(name="stem_bn")(y, use_running_average=not train)
        y = nn.relu(y)
        y = max_pool(y, 3, 2, padding=1)
        conv1_hw = (y.shape[1], y.shape[2])

        widths = (64, 128)
        feats = []
        in_planes = 64
        for li in range(2):
            planes = widths[li]
            out_planes = planes * (4 if block_kind == "bottleneck" else 1)
            for bi in range(counts[li]):
                stride = (2 if li > 0 else 1) if bi == 0 else 1
                needs_ds = bi == 0 and (stride != 1 or in_planes != out_planes)
                cls = Bottleneck if block_kind == "bottleneck" else BasicBlock
                y = cls(planes, stride, has_downsample=needs_ds,
                        downsample_stride=stride,
                        name=f"layer{li + 1}_{bi}")(y, train=train)
                in_planes = out_planes
            feats.append(y)

        y = BottleneckGCN(1024, self.kernel_sizes[0], self.gcn_features[0],
                          stride=2, name="layer3_0")(y, train=train)
        for bi in range(5):
            y = BottleneckGCN(1024, self.kernel_sizes[0], self.gcn_features[0],
                              name=f"layer3_{bi + 1}")(y, train=train)
        feats.append(y)
        y = BottleneckGCN(2048, self.kernel_sizes[1], self.gcn_features[1],
                          stride=2, name="layer4_0")(y, train=train)
        for bi in range(5):
            y = BottleneckGCN(2048, self.kernel_sizes[1], self.gcn_features[1],
                              name=f"layer4_{bi + 1}")(y, train=train)
        feats.append(y)
        return feats, conv1_hw


class GCN(nn.Module):
    num_classes: int
    in_channels: int = 3
    pretrained: bool = False
    use_resnet_gcn: bool = False
    backbone: str = "resnet50"
    use_deconv: bool = False
    num_filters: int = 11
    freeze_bn: bool = False
    freeze_backbone: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        bn_train = train and not self.freeze_bn
        H, W = x.shape[1], x.shape[2]

        if self.use_resnet_gcn:
            feats, conv1_hw = _ResnetGCNBackbone(
                backbone=self.backbone, name="backbone")(x, train=bn_train)
            x1, x2, x3, x4 = feats
        else:
            feats = ResNetFeatures(arch=self.backbone, style="torchvision",
                                   output_stride=32,
                                   name="backbone")(x, train=bn_train)
            x1, x2, x3, x4 = feats
            conv1_hw = (x1.shape[1], x1.shape[2])

        nc = self.num_classes
        x1 = BRBlock(name="br1")(GCNBlock(self.num_filters, nc, name="gcn1")(x1))
        x2 = BRBlock(name="br2")(GCNBlock(self.num_filters, nc, name="gcn2")(x2))
        x3 = BRBlock(name="br3")(GCNBlock(self.num_filters, nc, name="gcn3")(x3))
        x4 = BRBlock(name="br4")(GCNBlock(self.num_filters, nc, name="gcn4")(x4))

        def deconv(name):
            return ConvTranspose(nc, 3, 2, 1, output_padding=1, use_bias=False,
                                 kernel_init=kaiming_normal_init, name=name)

        if self.use_deconv:
            from segtpu.ops.shape import pad_or_crop_tl

            x4 = deconv("decon4")(x4)
            if x4.shape[1:3] != x3.shape[1:3]:
                x4 = pad_or_crop_tl(x4, x3.shape[1], x3.shape[2])
            x3 = deconv("decon3")(BRBlock(name="br5")(x3 + x4))
            if x3.shape[1:3] != x2.shape[1:3]:
                x3 = pad_or_crop_tl(x3, x2.shape[1], x2.shape[2])
            x2 = deconv("decon2")(BRBlock(name="br6")(x2 + x3))
            if x2.shape[1:3] != x1.shape[1:3]:
                # the reference omits this alignment and would crash on odd
                # sizes (latent upstream bug); documented divergence
                x2 = pad_or_crop_tl(x2, x1.shape[1], x1.shape[2])
            x1 = deconv("decon1")(BRBlock(name="br7")(x1 + x2))
            y = BRBlock(name="br9")(deconv("decon5")(BRBlock(name="br8")(x1)))
            if y.shape[1:3] != (H, W):
                y = pad_or_crop_tl(y, H, W)
        else:
            x4 = resize_bilinear(x4, x3.shape[1:3], align_corners=True)
            x3 = resize_bilinear(BRBlock(name="br5")(x3 + x4), x2.shape[1:3],
                                 align_corners=True)
            x2 = resize_bilinear(BRBlock(name="br6")(x2 + x3), x1.shape[1:3],
                                 align_corners=True)
            x1 = resize_bilinear(BRBlock(name="br7")(x1 + x2), conv1_hw,
                                 align_corners=True)
            y = BRBlock(name="br9")(
                resize_bilinear(BRBlock(name="br8")(x1), (H, W),
                                align_corners=True))
        out = Conv(nc, 1, kernel_init=kaiming_normal_init,
                   bias_init=_zero_bias, name="final_conv")(y)
        return {"out": out}
