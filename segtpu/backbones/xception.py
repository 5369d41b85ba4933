"""Aligned Xception backbone for DeepLabV3+ (NHWC, Flax).

Parity target: reference models/deeplabv3_plus.py:89-247 — entry flow
(conv 32 s2, conv 64, blocks 128/256/728 with strided residuals), 16-block
middle flow at 728 channels, exit flow (block20 + three separable convs to
1536/1536/2048), with the output-stride 8/16 stride/dilation plan
(reference :139-140). Low-level features tap after block1 (reference :209).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from segtpu.nn.blocks import SeparableConv
from segtpu.nn.layers import BatchNorm, Conv, kaiming_normal_init


class XceptionBlock(nn.Module):
    """Residual stack of three separable convs (reference :89-132).

    ``exit_flow`` reorders to (in->in, in->out, out->out) with the stride on
    the last conv; ``use_first_relu=False`` drops the leading ReLU (block1).
    """

    features: int
    stride: int = 1
    dilation: int = 1
    exit_flow: bool = False
    use_first_relu: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True):
        in_ch = x.shape[-1]
        if self.exit_flow:
            plan = [(in_ch, 1), (self.features, 1), (self.features, self.stride)]
        else:
            plan = [(self.features, 1), (self.features, 1), (self.features, self.stride)]

        # Reference quirk reproduced bug-for-bug: Block.rep[0] is
        # nn.ReLU(inplace=True), which MUTATES the block input before the
        # skip branch reads it (reference models/deeplabv3_plus.py:122-126:
        # ``output = self.rep(x)`` then ``skip = self.skip(x)`` / ``skip =
        # x``). So whenever the stack has a leading ReLU, the residual /
        # skip-conv input is relu(x), not x — including the middle flow's
        # identity branch.
        h = nn.relu(x) if self.use_first_relu else x
        y = h
        for i, (feat, stride) in enumerate(plan):
            if i > 0:
                y = nn.relu(y)
            y = SeparableConv(feat, 3, stride=stride, dilation=self.dilation,
                              kernel_init=kaiming_normal_init,
                              name=f"sep{i + 1}")(y, train=train)
            y = BatchNorm(name=f"bn{i + 1}")(y, use_running_average=not train)

        if in_ch != self.features or self.stride != 1:
            skip = Conv(self.features, 1, self.stride, use_bias=False,
                        kernel_init=kaiming_normal_init, name="skip_conv")(h)
            skip = BatchNorm(name="skip_bn")(skip, use_running_average=not train)
        else:
            skip = h
        return y + skip


class XceptionFeatures(nn.Module):
    output_stride: int = 16

    @nn.compact
    def __call__(self, x, train: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self.output_stride == 16:
            b3_s, mf_d, ef_d = 2, 1, (1, 2)
        elif self.output_stride == 8:
            b3_s, mf_d, ef_d = 1, 2, (2, 4)
        else:
            raise ValueError(f"unsupported output_stride {self.output_stride}")

        y = Conv(32, 3, 2, 1, use_bias=False, kernel_init=kaiming_normal_init,
                 name="conv1")(x)
        y = BatchNorm(name="bn1")(y, use_running_average=not train)
        y = nn.relu(y)
        y = Conv(64, 3, 1, 1, use_bias=False, kernel_init=kaiming_normal_init,
                 name="conv2")(y)
        y = BatchNorm(name="bn2")(y, use_running_average=not train)

        y = XceptionBlock(128, stride=2, use_first_relu=False,
                          name="block1")(y, train=train)
        low_level = y
        y = nn.relu(y)
        y = XceptionBlock(256, stride=2, name="block2")(y, train=train)
        y = XceptionBlock(728, stride=b3_s, name="block3")(y, train=train)

        for i in range(16):
            y = XceptionBlock(728, stride=1, dilation=mf_d,
                              name=f"block{i + 4}")(y, train=train)

        y = XceptionBlock(1024, stride=1, dilation=ef_d[0], exit_flow=True,
                          name="block20")(y, train=train)
        y = nn.relu(y)
        for i, feat in enumerate((1536, 1536, 2048)):
            y = SeparableConv(feat, 3, dilation=ef_d[1],
                              kernel_init=kaiming_normal_init,
                              name=f"conv{i + 3}")(y, train=train)
            y = BatchNorm(name=f"bn{i + 3}")(y, use_running_average=not train)
            y = nn.relu(y)
        return y, low_level
