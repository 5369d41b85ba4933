"""VGG-16 feature stacks (plain and BN variants) for FCN8 / SegNet.

Config (torchvision vgg16): 3x3/pad-1 convs
[64,64,M, 128,128,M, 256,256,256,M, 512,512,512,M, 512,512,512,M].

FCN8 needs the taps after pool3/pool4/pool5 with the first conv padded by 100
and ceil-mode pooling (reference models/fcn.py:17-27); SegNet needs the five
pre-pool stage outputs of the BN variant plus argmax indices for its unpooling
decoder (reference models/segnet.py:25-30,83-103).
"""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax.numpy as jnp

from segtpu.nn.layers import BatchNorm, Conv
from segtpu.ops.pooling import max_pool, max_pool_argmax

VGG16_STAGES: Tuple[Tuple[int, ...], ...] = (
    (64, 64), (128, 128), (256, 256, 256), (512, 512, 512), (512, 512, 512))


class VGG16Stage(nn.Module):
    """One pre-pool VGG stage: (conv3x3 [+BN] + ReLU) per width."""

    widths: Tuple[int, ...]
    batch_norm: bool = False
    first_padding: int = 1  # FCN8 pads the very first conv by 100

    @nn.compact
    def __call__(self, x, train: bool = True):
        for i, w in enumerate(self.widths):
            pad = self.first_padding if i == 0 else 1
            x = Conv(w, 3, padding=pad, name=f"conv{i}")(x)
            if self.batch_norm:
                x = BatchNorm(name=f"bn{i}")(x, use_running_average=not train)
            x = nn.relu(x)
        return x


class VGG16Features(nn.Module):
    """Returns the five POST-pool stage outputs (plain VGG16, ceil-mode pools
    for FCN8)."""

    batch_norm: bool = False
    first_padding: int = 1
    ceil_mode: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True) -> List[jnp.ndarray]:
        outs = []
        for si, widths in enumerate(VGG16_STAGES):
            x = VGG16Stage(widths, self.batch_norm,
                           self.first_padding if si == 0 else 1,
                           name=f"stage{si + 1}")(x, train=train)
            x = max_pool(x, 2, 2, ceil_mode=self.ceil_mode)
            outs.append(x)
        return outs


class VGG16BNEncoderWithIndices(nn.Module):
    """SegNet encoder: five BN stages, pooling with argmax indices.

    Returns (bottom, [(indices, pre_pool_hw), ...]) — the decoder unpools with
    these (reference models/segnet.py:83-103).
    """

    @nn.compact
    def __call__(self, x, train: bool = True):
        saved = []
        for si, widths in enumerate(VGG16_STAGES):
            x = VGG16Stage(widths, batch_norm=True,
                           name=f"stage{si + 1}")(x, train=train)
            pre_hw = (x.shape[1], x.shape[2])
            x, idx = max_pool_argmax(x)
            saved.append((idx, pre_hw))
        return x, saved
