"""Flax/linen building blocks for the segtpu model zoo.

NHWC layout throughout (TPU-native: channels on the 128-lane axis so convs
lower straight onto the MXU). Initializers and normalization semantics match
the reference's torch modules so converted pretrained weights are drop-in.
"""

from segtpu.nn.layers import (  # noqa: F401
    Conv,
    ConvTranspose,
    BatchNorm,
    ConvBNAct,
    torch_conv_kernel_init,
    torch_conv_bias_init,
    kaiming_normal_init,
)
from segtpu.nn.blocks import (  # noqa: F401
    SeparableConv,
    PSPModule,
    ASPP,
    FPNFuse,
    DUC,
)
