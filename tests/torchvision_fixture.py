"""Minimal torchvision-compatible model graphs (plain torch.nn, random init).

torchvision is not installed in this sandbox; the reference models build
their encoders from ``torchvision.models`` constructors (reference
models/fcn.py:12, segnet.py:16,203, gcn.py:81, upernet.py:43,
deeplabv3_plus.py:18, duc_hdc.py:59, pspnet.py:121). These are faithful
re-statements of the standard torchvision graph definitions — same
state_dict key layout, same forward math, same child-module order — so the
full-model parity tests can instantiate every reference model and validate
segtpu's converters against REAL torch module layouts. Weights are random
(no downloads); parity compares converted state_dicts, so init values are
irrelevant.

Install into the test's torchvision stub with :func:`install`.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# VGG (torchvision cfg "D"): features indices are part of the contract —
# FCN8 slices [:17], [17:24], [24:] (reference models/fcn.py:25-27), SegNet
# slices the BN variant at 6/13/23/33 boundaries (models/segnet.py:25-29).

_VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512, "M"]


class VGG(nn.Module):
    def __init__(self, batch_norm=False, num_classes=1000):
        super().__init__()
        layers = []
        in_ch = 3
        for v in _VGG16_CFG:
            if v == "M":
                layers.append(nn.MaxPool2d(kernel_size=2, stride=2))
            else:
                layers.append(nn.Conv2d(in_ch, v, kernel_size=3, padding=1))
                if batch_norm:
                    layers.append(nn.BatchNorm2d(v))
                layers.append(nn.ReLU(inplace=True))
                in_ch = v
        self.features = nn.Sequential(*layers)
        self.avgpool = nn.AdaptiveAvgPool2d((7, 7))
        self.classifier = nn.Sequential(
            nn.Linear(512 * 7 * 7, 4096), nn.ReLU(True), nn.Dropout(),
            nn.Linear(4096, 4096), nn.ReLU(True), nn.Dropout(),
            nn.Linear(4096, num_classes))

    def forward(self, x):
        x = self.features(x)
        x = self.avgpool(x)
        x = torch.flatten(x, 1)
        return self.classifier(x)


def vgg16(pretrained=False, weights=None, **kw):
    return VGG(batch_norm=False)


def vgg16_bn(pretrained=False, weights=None, **kw):
    return VGG(batch_norm=True)


# ---------------------------------------------------------------------------
# ResNet (torchvision layout: stride on conv2 of the Bottleneck — the
# variant every torchvision release ships; the reference's output-stride
# surgery mutates exactly that conv2, e.g. deeplabv3_plus.py:40-52).


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class ResNet(nn.Module):
    def __init__(self, layers, num_classes=1000):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(kernel_size=3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, layers[0])
        self.layer2 = self._make_layer(128, layers[1], stride=2)
        self.layer3 = self._make_layer(256, layers[2], stride=2)
        self.layer4 = self._make_layer(512, layers[3], stride=2)
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512 * Bottleneck.expansion, num_classes)

    def _make_layer(self, planes, blocks, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes * Bottleneck.expansion:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * Bottleneck.expansion, 1,
                          stride=stride, bias=False),
                nn.BatchNorm2d(planes * Bottleneck.expansion))
        layers = [Bottleneck(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * Bottleneck.expansion
        for _ in range(1, blocks):
            layers.append(Bottleneck(self.inplanes, planes))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = torch.flatten(self.avgpool(x), 1)
        return self.fc(x)


def resnet50(pretrained=False, weights=None, **kw):
    return ResNet([3, 4, 6, 3])


def resnet101(pretrained=False, weights=None, **kw):
    return ResNet([3, 4, 23, 3])


# ---------------------------------------------------------------------------
# DenseNet (torchvision layout: features OrderedDict conv0/norm0/relu0/pool0,
# denseblockN of denselayerM{norm1,conv1,norm2,conv2}, transitionN
# {norm,relu,conv,pool}, norm5; PSPDenseNet reads classifier.in_features and
# features.transition3.conv.out_channels — reference models/pspnet.py:121-147).


class _DenseLayer(nn.Module):
    def __init__(self, in_ch, growth, bn_size=4):
        super().__init__()
        self.norm1 = nn.BatchNorm2d(in_ch)
        self.relu1 = nn.ReLU(inplace=True)
        self.conv1 = nn.Conv2d(in_ch, bn_size * growth, 1, bias=False)
        self.norm2 = nn.BatchNorm2d(bn_size * growth)
        self.relu2 = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(bn_size * growth, growth, 3, padding=1,
                               bias=False)

    def forward(self, x):
        out = self.conv1(self.relu1(self.norm1(x)))
        out = self.conv2(self.relu2(self.norm2(out)))
        return torch.cat([x, out], 1)


class _DenseBlock(nn.Sequential):
    def __init__(self, num_layers, in_ch, growth):
        super().__init__()
        for i in range(num_layers):
            self.add_module(f"denselayer{i + 1}",
                            _DenseLayer(in_ch + i * growth, growth))


class _Transition(nn.Sequential):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.add_module("norm", nn.BatchNorm2d(in_ch))
        self.add_module("relu", nn.ReLU(inplace=True))
        self.add_module("conv", nn.Conv2d(in_ch, out_ch, 1, bias=False))
        self.add_module("pool", nn.AvgPool2d(kernel_size=2, stride=2))


class DenseNet(nn.Module):
    def __init__(self, growth=32, block_config=(6, 12, 24, 16),
                 num_init_features=64, num_classes=1000):
        super().__init__()
        from collections import OrderedDict

        self.features = nn.Sequential(OrderedDict([
            ("conv0", nn.Conv2d(3, num_init_features, 7, stride=2, padding=3,
                                bias=False)),
            ("norm0", nn.BatchNorm2d(num_init_features)),
            ("relu0", nn.ReLU(inplace=True)),
            ("pool0", nn.MaxPool2d(kernel_size=3, stride=2, padding=1)),
        ]))
        ch = num_init_features
        for i, n in enumerate(block_config):
            self.features.add_module(f"denseblock{i + 1}",
                                     _DenseBlock(n, ch, growth))
            ch = ch + n * growth
            if i != len(block_config) - 1:
                self.features.add_module(f"transition{i + 1}",
                                         _Transition(ch, ch // 2))
                ch = ch // 2
        self.features.add_module("norm5", nn.BatchNorm2d(ch))
        self.classifier = nn.Linear(ch, num_classes)

    def forward(self, x):
        x = F.relu(self.features(x), inplace=True)
        x = torch.flatten(F.adaptive_avg_pool2d(x, (1, 1)), 1)
        return self.classifier(x)


def densenet121(pretrained=False, weights=None, **kw):
    return DenseNet(32, (6, 12, 24, 16), 64)


def densenet201(pretrained=False, weights=None, **kw):
    return DenseNet(32, (6, 12, 48, 32), 64)


def install(tv_models_module):
    """Populate the test's ``torchvision.models`` stub module."""
    for name in ("vgg16", "vgg16_bn", "resnet50", "resnet101",
                 "densenet121", "densenet201"):
        setattr(tv_models_module, name, globals()[name])
