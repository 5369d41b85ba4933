"""FCN-8s on a VGG-16 backbone.

Parity target: reference models/fcn.py:9-114 — input padded by 100 on the
first conv (:17), ceil-mode pools (:20-22), FC6/FC7 as 7x7/1x1 convs (:34-45),
skip fusion from pool4 (x0.01) and pool3 (x0.0001) with hardcoded crop
offsets 5/9 (:91-99), frozen bilinear ConvTranspose upsamplers from
get_upsampling_weight (:55-73, utils/helpers.py:24-34), final crop at offset
31 back to the input size (:102).

The three upsamplers are fixed bilinear kernels in the reference (weights
frozen); here they are non-learnable resize matrices applied as MXU conv —
same math, no dead parameters.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from segtpu.backbones.vgg import VGG16Features
from segtpu.nn.layers import Conv

_REF = "reference models/fcn.py"


def _bilinear_kernel_np(channels: int, k: int) -> np.ndarray:
    """Bilinear ConvTranspose kernel (HWIO, diagonal across channels) —
    the get_upsampling_weight of reference utils/helpers.py:24-34."""
    factor = (k + 1) // 2
    center = factor - 1 if k % 2 == 1 else factor - 0.5
    og = np.ogrid[:k, :k]
    filt = (1 - abs(og[0] - center) / factor) * (1 - abs(og[1] - center) / factor)
    w = np.zeros((k, k, channels, channels), dtype=np.float32)
    for c in range(channels):
        w[:, :, c, c] = filt
    return w


def _fixed_upsample(x: jnp.ndarray, k: int, stride: int) -> jnp.ndarray:
    """Frozen ConvTranspose2d(k, stride, pad=0) with the bilinear kernel —
    expressed as an lhs-dilated conv (one MXU op, no trainable params)."""
    c = x.shape[-1]
    kernel = jnp.asarray(_bilinear_kernel_np(c, k), dtype=x.dtype)
    pad = k - 1
    return jax.lax.conv_general_dilated(
        x, jnp.flip(kernel, (0, 1)),
        window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class FCN8(nn.Module):
    num_classes: int
    in_channels: int = 3
    pretrained: bool = False
    freeze_bn: bool = False
    freeze_backbone: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        H, W = x.shape[1], x.shape[2]
        feats = VGG16Features(batch_norm=False, first_padding=100,
                              ceil_mode=True, name="backbone")(x, train=train)
        pool3, pool4, pool5 = feats[2], feats[3], feats[4]

        # FC6/FC7 head as convs (7x7 valid, then 1x1) + dropout (_REF:34-50).
        y = Conv(4096, 7, name="backbone_conv6")(pool5)
        y = nn.relu(y)
        y = nn.Dropout(0.5, deterministic=not train)(y)
        y = Conv(4096, 1, name="backbone_conv7")(y)
        y = nn.relu(y)
        y = nn.Dropout(0.5, deterministic=not train)(y)
        out = Conv(self.num_classes, 1, name="backbone_score")(y)

        up_out = _fixed_upsample(out, 4, 2)  # x2 + 2

        adj4 = Conv(self.num_classes, 1, name="adj_pool4")(0.01 * pool4)
        fused4 = adj4[:, 5:5 + up_out.shape[1], 5:5 + up_out.shape[2], :] + up_out
        up4 = _fixed_upsample(fused4, 4, 2)

        adj3 = Conv(self.num_classes, 1, name="adj_pool3")(0.0001 * pool3)
        fused3 = adj3[:, 9:9 + up4.shape[1], 9:9 + up4.shape[2], :] + up4
        final = _fixed_upsample(fused3, 16, 8)

        return {"out": final[:, 31:31 + H, 31:31 + W, :]}
