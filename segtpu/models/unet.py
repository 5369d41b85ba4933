"""UNet (from scratch) and UNetResnet (dilated-ResNet encoder).

Parity targets: reference models/unet.py — UNet (:61-117) with x2conv blocks
(:12-21), ceil-mode 2x2 max-pool encoders (:23-32), ConvTranspose(k=2,s=2)
decoders with skip concats (:34-58); UNetResnet (:126-209).

TPU notes: with crop-size training shapes are powers-of-two multiples, so the
interpolate-on-mismatch branch of the reference decoder is a static no-op
check here (shapes are known at trace time).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from segtpu.nn.layers import BatchNorm, Conv, ConvTranspose, kaiming_normal_init
from segtpu.nn.blocks import SeparableConv  # noqa: F401  (re-export convenience)
from segtpu.backbones.resnet import ResNetFeatures
from segtpu.ops.pooling import max_pool
from segtpu.ops.resize import resize_bilinear


def _zero_bias(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


class X2Conv(nn.Module):
    """(conv3x3 -> BN -> ReLU) x2 with an inner bottleneck width
    (reference models/unet.py:12-21)."""

    features: int
    inner_features: int | None = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        inner = self.inner_features or self.features // 2
        x = Conv(inner, 3, padding=1, use_bias=False,
                 kernel_init=kaiming_normal_init, name="conv1")(x)
        x = BatchNorm(name="bn1")(x, use_running_average=not train)
        x = nn.relu(x)
        x = Conv(self.features, 3, padding=1, use_bias=False,
                 kernel_init=kaiming_normal_init, name="conv2")(x)
        x = BatchNorm(name="bn2")(x, use_running_average=not train)
        return nn.relu(x)


class UNet(nn.Module):
    """Classic UNet trained from scratch (no backbone)."""

    num_classes: int
    in_channels: int = 3
    freeze_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        bn_train = train and not self.freeze_bn

        # Each stage convs at the finer resolution, then pools; the POOLED map
        # is both the next stage's input and the decoder skip (reference
        # models/unet.py:23-32,93-103).
        x1 = X2Conv(64, name="start_conv")(x, train=bn_train)
        x2 = max_pool(X2Conv(128, name="down1")(x1, train=bn_train), 2, ceil_mode=True)
        x3 = max_pool(X2Conv(256, name="down2")(x2, train=bn_train), 2, ceil_mode=True)
        x4 = max_pool(X2Conv(512, name="down3")(x3, train=bn_train), 2, ceil_mode=True)
        d = max_pool(X2Conv(1024, name="down4")(x4, train=bn_train), 2, ceil_mode=True)
        y = X2Conv(1024, name="middle_conv")(d, train=bn_train)

        for skip, feat, name in ((x4, 512, "up1"), (x3, 256, "up2"),
                                 (x2, 128, "up3"), (x1, 64, "up4")):
            y = ConvTranspose(y.shape[-1] // 2, 2, 2,
                              kernel_init=kaiming_normal_init,
                              bias_init=_zero_bias, name=f"{name}_up")(y)
            if y.shape[1:3] != skip.shape[1:3]:
                y = resize_bilinear(y, skip.shape[1:3], align_corners=True)
            y = jnp.concatenate([skip, y], axis=-1)
            y = X2Conv(feat, name=f"{name}_conv")(y, train=bn_train)

        out = Conv(self.num_classes, 1, kernel_init=kaiming_normal_init,
                   bias_init=_zero_bias, name="final_conv")(y)
        return {"out": out}


class UNetResnet(nn.Module):
    """UNet variant with a dilated-ResNet encoder
    (reference models/unet.py:126-209). Encoder = encoding-style ResNet
    (stride 8 via dilation); decoder = conv3x3 + ConvTranspose(k=4,s=2,p=1)
    stages with skip concats at 1/4, 1/8 scales."""

    num_classes: int
    in_channels: int = 3
    backbone: str = "resnet50"
    pretrained: bool = False
    freeze_bn: bool = False
    freeze_backbone: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        bn_train = train and not self.freeze_bn
        H, W = x.shape[1], x.shape[2]
        x1, x2, x3, x4 = ResNetFeatures(
            arch=self.backbone, style="encoding",
            name="backbone")(x, train=bn_train)

        def conv(feat, k, name, use_bias=True):
            return Conv(feat, k, padding=k // 2,
                        kernel_init=kaiming_normal_init,
                        bias_init=_zero_bias if use_bias else None,
                        use_bias=use_bias, name=name)

        def upconv(feat, name):
            return ConvTranspose(feat, 4, 2, 1, use_bias=False,
                                 kernel_init=kaiming_normal_init, name=name)

        y = upconv(128, "upconv1")(conv(192, 3, "conv1")(x4))
        y = resize_bilinear(y, (x3.shape[1], x3.shape[2]), align_corners=True)
        y = jnp.concatenate([y, x3], axis=-1)
        y = upconv(96, "upconv2")(conv(128, 3, "conv2")(y))
        y = resize_bilinear(y, (x2.shape[1], x2.shape[2]), align_corners=True)
        y = jnp.concatenate([y, x2], axis=-1)
        y = upconv(64, "upconv3")(conv(96, 3, "conv3")(y))
        y = resize_bilinear(y, (x1.shape[1], x1.shape[2]), align_corners=True)
        y = jnp.concatenate([y, x1], axis=-1)
        y = upconv(48, "upconv4")(conv(64, 3, "conv4")(y))
        y = upconv(32, "upconv5")(conv(48, 3, "conv5")(y))
        if y.shape[1] != H or y.shape[2] != W:
            y = resize_bilinear(y, (H, W), align_corners=True)
        y = conv(32, 3, "conv6")(y)
        out = Conv(self.num_classes, 1, use_bias=False,
                   kernel_init=kaiming_normal_init, name="conv7")(y)
        return {"out": out}
