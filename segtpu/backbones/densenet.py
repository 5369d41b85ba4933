"""DenseNet feature extractor with PSP-style dilation surgery (NHWC, Flax).

Parity target: reference models/pspnet.py:117-156 (PSPDenseNet backbone
wiring): torchvision densenet-201 features with

* transition2/transition3 pooling removed (output stride stays 8),
* denseblock3 3x3 convs dilated 2, denseblock4 dilated 4,
* a 3x3-conv stem stack when training from scratch (reference :125-135,
  faithfully including its padding-0 convs).

DenseNet-201 config: growth 32, blocks (6, 12, 48, 32), stem 64, bn_size 4.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from segtpu.nn.layers import BatchNorm, Conv, kaiming_normal_init
from segtpu.ops.pooling import avg_pool, max_pool

DENSENET_CONFIG = {
    "densenet121": (32, (6, 12, 24, 16), 64),
    "densenet169": (32, (6, 12, 32, 32), 64),
    "densenet201": (32, (6, 12, 48, 32), 64),
    "densenet161": (48, (6, 12, 36, 24), 96),
}


class DenseLayer(nn.Module):
    """One bottleneck layer: BN-ReLU-1x1 -> BN-ReLU-3x3, returning only the
    ``growth`` new feature channels. Takes the previous features UNPACKED
    (``*parts``) and concatenates them itself — under ``nn.remat`` the saved
    residuals are then the shared per-layer growth tensors instead of each
    layer's full concatenated input, torchvision's memory_efficient=True
    formulation expressed as a checkpoint boundary."""

    growth: int
    bn_size: int = 4
    dilation: int = 1

    @nn.compact
    def __call__(self, train: bool, *parts):
        x = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
        y = BatchNorm(name="norm1")(x, use_running_average=not train)
        y = nn.relu(y)
        y = Conv(self.bn_size * self.growth, 1, use_bias=False, name="conv1")(y)
        y = BatchNorm(name="norm2")(y, use_running_average=not train)
        y = nn.relu(y)
        y = Conv(self.growth, 3, padding=self.dilation, dilation=self.dilation,
                 use_bias=False, name="conv2")(y)
        return y


class DenseBlock(nn.Module):
    """``remat_layers`` checkpoints each DenseLayer: without it, autodiff
    keeps every layer's relu(norm1(concat)) alive — ~14 GB for DenseNet-201
    blocks 3+4 at 769², bs8, bf16 (the sweep's OOM even with whole-step
    remat, whose replay re-stores the same residuals). With it, the only
    residuals are the x0 + per-layer growth tensors the block output is made
    of (~0.5 GB), and the backward replays concat+BN+ReLU+convs per layer."""

    num_layers: int
    growth: int
    dilation: int = 1
    remat_layers: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        layer_cls = (nn.remat(DenseLayer, static_argnums=(1,))
                     if self.remat_layers else DenseLayer)
        ys = [x]
        for i in range(self.num_layers):
            y = layer_cls(self.growth, dilation=self.dilation,
                          name=f"denselayer{i + 1}")(train, *ys)
            ys.append(y)
        return jnp.concatenate(ys, axis=-1)


class Transition(nn.Module):
    features: int
    pool: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = BatchNorm(name="norm")(x, use_running_average=not train)
        x = nn.relu(x)
        x = Conv(self.features, 1, use_bias=False, name="conv")(x)
        if self.pool:
            x = avg_pool(x, 2, 2)
        return x


class DenseNetFeatures(nn.Module):
    """Returns (block4_output, transition3_output) — the master/aux taps of
    PSPDenseNet (reference models/pspnet.py:174-184)."""

    arch: str = "densenet201"
    pretrained_stem: bool = False  # 7x7 stem (pretrained) vs 3x3 stack
    remat_layers: bool = False  # memory-efficient DenseNet (see DenseBlock)

    @nn.compact
    def __call__(self, x, train: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        growth, blocks, stem = DENSENET_CONFIG[self.arch]

        if self.pretrained_stem:
            y = Conv(stem, 7, 2, 3, use_bias=False, name="stem_conv")(x)
            y = BatchNorm(name="stem_bn")(y, use_running_average=not train)
            y = nn.relu(y)
            y = max_pool(y, 3, 2, padding=1)
        else:
            # From-scratch stem (reference models/pspnet.py:127-135): note the
            # padding-0 convs are faithful to upstream.
            y = Conv(64, 3, 2, 0, use_bias=False, kernel_init=kaiming_normal_init,
                     name="stem_conv0")(x)
            y = BatchNorm(name="stem_bn0")(y, use_running_average=not train)
            y = nn.relu(y)
            for i in (1, 2):
                y = Conv(64, 3, 1, 0, use_bias=False,
                         kernel_init=kaiming_normal_init, name=f"stem_conv{i}")(y)
                y = BatchNorm(name=f"stem_bn{i}")(y, use_running_average=not train)
                y = nn.relu(y)
            y = max_pool(y, 3, 2, padding=1)

        ch = y.shape[-1]
        dilations = (1, 1, 2, 4)
        pools = (True, False, False, None)  # transition1 pools; 2/3 do not
        aux = None
        for bi in range(4):
            y = DenseBlock(blocks[bi], growth, dilation=dilations[bi],
                           remat_layers=self.remat_layers,
                           name=f"denseblock{bi + 1}")(y, train=train)
            ch = y.shape[-1]
            if bi < 3:
                y = Transition(ch // 2, pool=bool(pools[bi]),
                               name=f"transition{bi + 1}")(y, train=train)
                if bi == 2:
                    aux = y
        return y, aux
