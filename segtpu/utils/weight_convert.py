"""Offline pretrained-weight import: torch state_dicts -> segtpu param trees.

Replaces the reference's runtime downloads (reference models/resnet.py:292-306
zip fetch, torchvision model_zoo) with an offline converter: download a torch
checkpoint elsewhere, run this once, get an orbax-loadable pytree.

Conversion is driven by OUR param tree: for every leaf we derive the expected
torch key, so a missing key is a hard error (completeness by construction).

Layout rules:
* conv kernel (O, I, kh, kw)        -> HWIO (kh, kw, I, O)
* conv-transpose kernel (I, O, kh, kw) -> (kh, kw, I, O)
* linear (O, I)                     -> (I, O)
* BN weight/bias                    -> params scale/bias
* BN running_mean/var               -> batch_stats mean/var

Supported families: torchvision ResNet (DeepLab/UperNet/GCN/SegResNet),
encoding-style deep-base ResNet (PSPNet/UNetResnet), VGG16 / VGG16-BN
(FCN8/SegNet), DenseNet (PSPDenseNet), Cadene Xception (DeepLab-xception,
including the reference's block11->block12..19 middle-flow replication,
reference models/deeplabv3_plus.py:171-199).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from segtpu.backbones.resnet import RESNET_LAYERS
from segtpu.backbones.vgg import VGG16_STAGES


def _conv(w) -> np.ndarray:
    return np.transpose(np.asarray(w, np.float32), (2, 3, 1, 0))


def _bn(sd, torch_prefix) -> Tuple[Dict, Dict]:
    params = {"scale": np.asarray(sd[f"{torch_prefix}.weight"], np.float32),
              "bias": np.asarray(sd[f"{torch_prefix}.bias"], np.float32)}
    stats = {"mean": np.asarray(sd[f"{torch_prefix}.running_mean"], np.float32),
             "var": np.asarray(sd[f"{torch_prefix}.running_var"], np.float32)}
    return params, stats


def convert_resnet(state_dict: Dict, arch: str = "resnet50",
                   style: str = "torchvision") -> Tuple[Dict, Dict]:
    """Returns (params, batch_stats) for ResNetFeatures."""
    block_kind, counts = RESNET_LAYERS[arch]
    deep_base = style == "encoding" and block_kind == "bottleneck"
    params: Dict = {}
    stats: Dict = {}

    def put_bn(name, torch_prefix):
        p, s = _bn(state_dict, torch_prefix)
        params[name] = p
        stats[name] = s

    if deep_base:
        # encoding stem is nn.Sequential(conv,bn,relu,conv,bn,relu,conv)
        params["stem_conv1"] = {"kernel": _conv(state_dict["conv1.0.weight"])}
        put_bn("stem_bn1", "conv1.1")
        params["stem_conv2"] = {"kernel": _conv(state_dict["conv1.3.weight"])}
        put_bn("stem_bn2", "conv1.4")
        params["stem_conv3"] = {"kernel": _conv(state_dict["conv1.6.weight"])}
    else:
        params["stem_conv1"] = {"kernel": _conv(state_dict["conv1.weight"])}
    put_bn("stem_bn", "bn1")

    n_convs = 3 if block_kind == "bottleneck" else 2
    for li in range(4):
        for bi in range(counts[li]):
            t = f"layer{li + 1}.{bi}"
            o = f"layer{li + 1}_{bi}"
            params[o] = {}
            stats[o] = {}
            for ci in range(1, n_convs + 1):
                params[o][f"conv{ci}"] = {
                    "kernel": _conv(state_dict[f"{t}.conv{ci}.weight"])}
                p, s = _bn(state_dict, f"{t}.bn{ci}")
                params[o][f"bn{ci}"] = p
                stats[o][f"bn{ci}"] = s
            if f"{t}.downsample.0.weight" in state_dict:
                params[o]["downsample_conv"] = {
                    "kernel": _conv(state_dict[f"{t}.downsample.0.weight"])}
                p, s = _bn(state_dict, f"{t}.downsample.1")
                params[o]["downsample_bn"] = p
                stats[o]["downsample_bn"] = s
    return params, stats


def convert_vgg16(state_dict: Dict, batch_norm: bool = False) -> Tuple[Dict, Dict]:
    """Returns (params, batch_stats) for VGG16Features / the SegNet encoder."""
    params: Dict = {}
    stats: Dict = {}
    idx = 0
    for si, widths in enumerate(VGG16_STAGES):
        stage_p: Dict = {}
        stage_s: Dict = {}
        for ci, _w in enumerate(widths):
            stage_p[f"conv{ci}"] = {
                "kernel": _conv(state_dict[f"features.{idx}.weight"]),
                "bias": np.asarray(state_dict[f"features.{idx}.bias"],
                                   np.float32)}
            idx += 1
            if batch_norm:
                p, s = _bn(state_dict, f"features.{idx}")
                stage_p[f"bn{ci}"] = p
                stage_s[f"bn{ci}"] = s
                idx += 1
            idx += 1  # ReLU
        idx += 1  # MaxPool
        params[f"stage{si + 1}"] = stage_p
        if stage_s:
            stats[f"stage{si + 1}"] = stage_s
    return params, stats


def convert_vgg16_classifier(state_dict: Dict) -> Dict:
    """FCN8's conv6/conv7 from VGG's FC layers (reference models/fcn.py:39-45):
    fc6 (4096, 25088) -> 7x7x512x4096 conv, fc7 -> 1x1 conv."""
    fc6_w = np.asarray(state_dict["classifier.0.weight"], np.float32)
    fc6 = fc6_w.reshape(4096, 512, 7, 7)
    fc7_w = np.asarray(state_dict["classifier.3.weight"], np.float32)
    fc7 = fc7_w.reshape(4096, 4096, 1, 1)
    return {
        "backbone_conv6": {"kernel": _conv(fc6),
                           "bias": np.asarray(state_dict["classifier.0.bias"],
                                              np.float32)},
        "backbone_conv7": {"kernel": _conv(fc7),
                           "bias": np.asarray(state_dict["classifier.3.bias"],
                                              np.float32)},
    }


def convert_densenet(state_dict: Dict, arch: str = "densenet201"
                     ) -> Tuple[Dict, Dict]:
    """Returns (params, batch_stats) for DenseNetFeatures (pretrained_stem)."""
    from segtpu.backbones.densenet import DENSENET_CONFIG

    growth, blocks, stem = DENSENET_CONFIG[arch]
    params: Dict = {}
    stats: Dict = {}
    params["stem_conv"] = {"kernel": _conv(state_dict["features.conv0.weight"])}
    p, s = _bn(state_dict, "features.norm0")
    params["stem_bn"] = p
    stats["stem_bn"] = s

    for bi in range(4):
        bp: Dict = {}
        bs: Dict = {}
        for li in range(blocks[bi]):
            t = f"features.denseblock{bi + 1}.denselayer{li + 1}"
            lp: Dict = {}
            ls: Dict = {}
            for norm, conv in (("norm1", "conv1"), ("norm2", "conv2")):
                p, s = _bn(state_dict, f"{t}.{norm}")
                lp[norm] = p
                ls[norm] = s
                lp[conv] = {"kernel": _conv(state_dict[f"{t}.{conv}.weight"])}
            bp[f"denselayer{li + 1}"] = lp
            bs[f"denselayer{li + 1}"] = ls
        params[f"denseblock{bi + 1}"] = bp
        stats[f"denseblock{bi + 1}"] = bs
        if bi < 3:
            t = f"features.transition{bi + 1}"
            p, s = _bn(state_dict, f"{t}.norm")
            params[f"transition{bi + 1}"] = {
                "norm": p, "conv": {"kernel": _conv(state_dict[f"{t}.conv.weight"])}}
            stats[f"transition{bi + 1}"] = {"norm": s}
    return params, stats


def convert_xception(state_dict: Dict) -> Tuple[Dict, Dict]:
    """Cadene xception -> XceptionFeatures, replicating the reference's remap
    (middle-flow block11 copied to blocks 12-19, exit-flow renames; pointwise
    [C,C] unsqueezed to 1x1 conv — reference models/deeplabv3_plus.py:171-199).
    """
    sd = dict(state_dict)
    # pointwise convs may be stored [O, I]; normalize to [O, I, 1, 1]
    for k, v in list(sd.items()):
        arr = np.asarray(v)
        if "pointwise" in k and arr.ndim == 2:
            sd[k] = arr[:, :, None, None]
    # replicate middle flow + exit-flow renames
    for k in list(sd.keys()):
        if k.startswith("block11."):
            for i in range(12, 20):
                sd.setdefault(k.replace("block11", f"block{i}"), sd[k])
        elif k.startswith("block12."):
            sd.setdefault(k.replace("block12", "block20"), sd[k])
    for k in list(sd.keys()):
        if k.startswith("bn3."):
            sd.setdefault(k.replace("bn3", "bn4"), sd[k])
        elif k.startswith("conv4."):
            sd.setdefault(k.replace("conv4", "conv5"), sd[k])
    for k in list(sd.keys()):
        if k.startswith("bn4."):
            sd.setdefault(k.replace("bn4", "bn5"), sd[k])

    params: Dict = {}
    stats: Dict = {}

    def put_bn(name, torch_prefix, into_p=None, into_s=None):
        p, s = _bn(sd, torch_prefix)
        (params if into_p is None else into_p)[name] = p
        (stats if into_s is None else into_s)[name] = s

    def sepconv(torch_prefix):
        """SeparableConv2d: conv1 (depthwise) + bn + pointwise
        (reference models/deeplabv3_plus.py:70-86)."""
        out = {"depthwise": {"kernel": _conv(sd[f"{torch_prefix}.conv1.weight"])},
               "pointwise": {"kernel": _conv(sd[f"{torch_prefix}.pointwise.weight"])}}
        p, s = _bn(sd, f"{torch_prefix}.bn")
        out["bn"] = p
        return out, {"bn": s}

    params["conv1"] = {"kernel": _conv(sd["conv1.weight"])}
    put_bn("bn1", "bn1")
    params["conv2"] = {"kernel": _conv(sd["conv2.weight"])}
    put_bn("bn2", "bn2")

    # Blocks: the reference's Block stores its stack as rep.{j} with layout
    # [relu?, Sep, BN] x3 — Sep at (1,4,7) with a leading relu, (0,3,6)
    # without (block1 only, reference :120,149).
    for b in range(1, 21):
        t = f"block{b}"
        if f"{t}.rep.1.conv1.weight" in sd:
            sep_idx = (1, 4, 7)  # leading relu present
        else:
            sep_idx = (0, 3, 6)
        bp: Dict = {}
        bs: Dict = {}
        for si, ri in enumerate(sep_idx):
            sp, ss = sepconv(f"{t}.rep.{ri}")
            bp[f"sep{si + 1}"] = sp
            bs[f"sep{si + 1}"] = ss
            put_bn(f"bn{si + 1}", f"{t}.rep.{ri + 1}", bp, bs)
        if f"{t}.skip.weight" in sd:
            bp["skip_conv"] = {"kernel": _conv(sd[f"{t}.skip.weight"])}
            put_bn("skip_bn", f"{t}.skipbn", bp, bs)
        params[t] = bp
        stats[t] = bs

    for i in (3, 4, 5):
        sp, ss = sepconv(f"conv{i}")
        params[f"conv{i}"] = sp
        stats[f"conv{i}"] = ss
        put_bn(f"bn{i}", f"bn{i}")
    return params, stats


CONVERTERS = {
    "resnet": convert_resnet,
    "vgg16": convert_vgg16,
    "densenet": convert_densenet,
}
