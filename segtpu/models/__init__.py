"""Model zoo registry.

Same registry names as the reference (reference models/__init__.py:1-11):
``FCN8, UNet, UNetResnet, SegNet, SegResNet, ENet, GCN, DeepLab,
DeepLab_DUC_HDC, UperNet, PSPNet, PSPDenseNet``.

Model API (every entry):

* Flax module with constructor attrs ``num_classes, in_channels=3`` plus
  model-specific options (``backbone``, ``pretrained``, ``freeze_bn``,
  ``freeze_backbone``, ``output_stride``, ``use_aux``, ...) mirroring the
  reference constructors.
* ``__call__(x, train: bool) -> dict`` with key ``"out"`` = (B, H, W, C)
  logits and, for PSP-family models in training mode, ``"aux"`` (the reference
  returns a tuple there, reference models/pspnet.py:89-93; a dict keeps the
  jitted train step shape-stable).
* Backbone parameters (when a pretrained encoder exists) live under the
  ``backbone`` submodule scope — the partition label for differential LR and
  freeze_backbone (replaces reference ``get_backbone_params`` /
  ``get_decoder_params``, e.g. models/pspnet.py:96-101).
* ``freeze_bn`` keeps every BatchNorm in running-average mode during training
  (reference ``freeze_bn()`` methods setting modules to eval).
"""

from segtpu.models.unet import UNet, UNetResnet
from segtpu.models.pspnet import PSPNet, PSPDenseNet
from segtpu.models.deeplabv3_plus import DeepLab
from segtpu.models.duc_hdc import DeepLab_DUC_HDC
from segtpu.models.upernet import UperNet
from segtpu.models.fcn import FCN8
from segtpu.models.segnet import SegNet, SegResNet
from segtpu.models.enet import ENet
from segtpu.models.gcn import GCN

MODELS = {
    "FCN8": FCN8,
    "UNet": UNet,
    "UNetResnet": UNetResnet,
    "SegNet": SegNet,
    "SegResNet": SegResNet,
    "ENet": ENet,
    "GCN": GCN,
    "DeepLab": DeepLab,
    "DeepLab_DUC_HDC": DeepLab_DUC_HDC,
    "UperNet": UperNet,
    "PSPNet": PSPNet,
    "PSPDenseNet": PSPDenseNet,
}


def get_model(name: str, **kwargs):
    if name not in MODELS:
        raise KeyError(f"unknown model {name!r}; available: {sorted(MODELS)}")
    return MODELS[name](**kwargs)
