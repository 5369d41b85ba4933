"""Backbone encoders for the segtpu model zoo (NHWC, Flax).

One configurable implementation per family:

* :mod:`segtpu.backbones.resnet` — covers the reference's two ResNet flavors
  (PyTorch-Encoding deep-base dilated ResNet, reference models/resnet.py, and
  torchvision ResNet with output-stride surgery, reference
  models/deeplabv3_plus.py:15-53) plus the HDC dilation schedules
  (reference models/duc_hdc.py:78-103).
* :mod:`segtpu.backbones.vgg` — VGG16 / VGG16-BN feature stacks (FCN8, SegNet).
* :mod:`segtpu.backbones.xception` — Aligned Xception-71-ish (DeepLabV3+).
* :mod:`segtpu.backbones.densenet` — DenseNet-201 with dilation surgery
  (PSPDenseNet).

Pretrained torch checkpoints are imported offline via
segtpu.utils.weight_convert (no network access at runtime).
"""

from segtpu.backbones.resnet import ResNetFeatures, RESNET_LAYERS  # noqa: F401
