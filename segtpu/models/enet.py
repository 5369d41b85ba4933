"""ENet — real-time segmentation network built from scratch.

Parity target: reference models/enet.py — InitalBlock concat(conv, pool)
(:8-20); BottleNeck with downsample (2x2/s2 conv projection + indexed pool),
upsample (1x1 + BN + MaxUnpool identity, ConvTranspose main), asymmetric
5x1+1x5, and dilated variants, PReLU activations, channel zero-pad of the
identity (:22-124); the 6-stage network with dilations up to 16 (:126-218);
final full ConvTranspose (k=3, s=2, p=1, output_padding=1) classifier (:169).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from segtpu.nn.layers import BatchNorm, Conv, ConvTranspose, kaiming_normal_init
from segtpu.ops.pooling import max_pool_argmax, max_unpool


class PReLU(nn.Module):
    """torch nn.PReLU(): single shared slope, init 0.25."""

    num_parameters: int = 1

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", lambda k, s: jnp.full(s, 0.25, jnp.float32),
                           (self.num_parameters,))
        a = alpha.astype(x.dtype)
        if self.num_parameters == 1:
            a = a[0]
        return jnp.where(x >= 0, x, a * x)


class InitialBlock(nn.Module):
    """concat(3x3/s2 conv to 16-in_ch, 2x2 maxpool) + BN + PReLU
    (reference models/enet.py:8-20)."""

    @nn.compact
    def __call__(self, x, train: bool = True):
        from segtpu.ops.pooling import max_pool

        in_ch = x.shape[-1]
        conv = Conv(16 - in_ch, 3, 2, 1, kernel_init=kaiming_normal_init,
                    name="conv")(x)
        pool = max_pool(x, 2, 2, ceil_mode=True)
        y = jnp.concatenate([pool, conv], axis=-1)
        y = BatchNorm(name="bn")(y, use_running_average=not train)
        return PReLU(16, name="prelu")(y)


class Bottleneck(nn.Module):
    """ENet bottleneck (reference models/enet.py:22-124)."""

    out_features: Optional[int] = None
    dilation: int = 1
    downsample: bool = False
    upsample: bool = False
    asymmetric: bool = False
    p_drop: float = 0.1
    use_prelu: bool = True
    proj_ratio: int = 4

    @nn.compact
    def __call__(self, x, train: bool = True, indices=None, output_size=None):
        in_ch = x.shape[-1]
        out_ch = self.out_features or in_ch
        inter = in_ch // self.proj_ratio
        act = (lambda n: PReLU(name=n)) if self.use_prelu else (lambda n: None)

        def activate(y, name):
            return PReLU(name=name)(y) if self.use_prelu else nn.relu(y)

        # Identity branch
        identity = x
        idx_out = None
        if self.upsample:
            identity = Conv(out_ch, 1, use_bias=False, name="spatial_conv")(identity)
            identity = BatchNorm(name="bn_up")(identity,
                                               use_running_average=not train)
            identity = max_unpool(identity, indices, output_size=output_size)
        elif self.downsample:
            identity, idx_out = max_pool_argmax(identity)
        if out_ch > in_ch and not self.upsample:
            pad = out_ch - in_ch
            identity = jnp.pad(identity, ((0, 0), (0, 0), (0, 0), (0, pad)))

        # Bottleneck branch
        if self.downsample:
            y = Conv(inter, 2, 2, use_bias=False, name="conv1")(x)
        else:
            y = Conv(inter, 1, use_bias=False, name="conv1")(x)
        y = BatchNorm(name="bn1")(y, use_running_average=not train)
        y = activate(y, "prelu1")

        if self.asymmetric:
            y = Conv(inter, (1, 5), padding=(0, 2), name="conv2a")(y)
            y = BatchNorm(name="bn2a")(y, use_running_average=not train)
            y = activate(y, "prelu2a")
            y = Conv(inter, (5, 1), padding=(2, 0), name="conv2b")(y)
        elif self.upsample:
            y = ConvTranspose(inter, 3, 2, 1, output_padding=1, use_bias=False,
                              name="conv2")(y)
        else:
            y = Conv(inter, 3, padding=self.dilation, dilation=self.dilation,
                     use_bias=False, name="conv2")(y)
        y = BatchNorm(name="bn2")(y, use_running_average=not train)
        y = activate(y, "prelu2")

        y = Conv(out_ch, 1, use_bias=False, name="conv3")(y)
        y = BatchNorm(name="bn3")(y, use_running_average=not train)
        y = activate(y, "prelu3")
        y = nn.Dropout(self.p_drop, deterministic=not train,
                       broadcast_dims=(1, 2))(y)  # Dropout2d: per-channel

        if identity.shape[1:3] != y.shape[1:3]:
            # torch F.pad semantics: negative pad crops (odd input sizes make
            # the ConvTranspose branch one pixel LARGER than the unpooled
            # identity, reference models/enet.py:114-117)
            from segtpu.ops.shape import pad_or_crop_tl

            y = pad_or_crop_tl(y, identity.shape[1], identity.shape[2])

        y = activate(y + identity, "prelu_out")
        if self.downsample:
            return y, idx_out
        return y


class ENet(nn.Module):
    num_classes: int
    in_channels: int = 3
    freeze_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        bn_train = train and not self.freeze_bn
        y = InitialBlock(name="initial")(x, train=bn_train)

        # Stage 1
        sz1 = (y.shape[1], y.shape[2])
        y, idx1 = Bottleneck(64, downsample=True, p_drop=0.01,
                             name="bottleneck10")(y, train=bn_train)
        for i in range(1, 5):
            y = Bottleneck(p_drop=0.01, name=f"bottleneck1{i}")(y, train=bn_train)

        # Stage 2
        sz2 = (y.shape[1], y.shape[2])
        y, idx2 = Bottleneck(128, downsample=True, name="bottleneck20")(y, train=bn_train)
        stage2 = [dict(), dict(dilation=2), dict(asymmetric=True),
                  dict(dilation=4), dict(), dict(dilation=8),
                  dict(asymmetric=True), dict(dilation=16)]
        for i, kw in enumerate(stage2):
            y = Bottleneck(**kw, name=f"bottleneck2{i + 1}")(y, train=bn_train)
        # Stage 3 repeats the stage-2 pattern without the downsample
        for i, kw in enumerate(stage2):
            y = Bottleneck(**kw, name=f"bottleneck3{i + 1}")(y, train=bn_train)

        # Stage 4
        y = Bottleneck(64, upsample=True, use_prelu=False,
                       name="bottleneck40")(y, train=bn_train,
                                            indices=idx2, output_size=sz2)
        y = Bottleneck(use_prelu=False, name="bottleneck41")(y, train=bn_train)
        y = Bottleneck(use_prelu=False, name="bottleneck42")(y, train=bn_train)

        # Stage 5
        y = Bottleneck(16, upsample=True, use_prelu=False,
                       name="bottleneck50")(y, train=bn_train,
                                            indices=idx1, output_size=sz1)
        y = Bottleneck(use_prelu=False, name="bottleneck51")(y, train=bn_train)

        out = ConvTranspose(self.num_classes, 3, 2, 1, output_padding=1,
                            use_bias=False, kernel_init=kaiming_normal_init,
                            name="fullconv")(y)
        # odd input sizes produce one extra output pixel (the reference has
        # no epilogue crop and would fail the loss shape check upstream —
        # latent bug); crop back to the input extent
        if out.shape[1] != x.shape[1] or out.shape[2] != x.shape[2]:
            out = out[:, : x.shape[1], : x.shape[2], :]
        return {"out": out}
