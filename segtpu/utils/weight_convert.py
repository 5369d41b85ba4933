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


def _convT(w) -> np.ndarray:
    """torch ConvTranspose2d kernel (I, O, kh, kw) -> HWIO (kh, kw, I, O);
    segtpu's ConvTranspose flips spatially at call time (nn/layers.py:151)."""
    return np.transpose(np.asarray(w, np.float32), (2, 3, 0, 1))


def _vec(v) -> np.ndarray:
    return np.asarray(v, np.float32)


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


# ---------------------------------------------------------------------------
# FULL-MODEL converters: migrate reference-trained checkpoints (torch
# state_dicts of the whole network, not just the encoder) into segtpu
# variable trees. Also the basis of the numerical-parity test suite
# (tests/test_reference_parity.py).

def convert_unet(state_dict: Dict) -> Tuple[Dict, Dict]:
    """Reference UNet (models/unet.py:61-117) -> segtpu UNet variables.

    torch x2conv is Sequential[conv,bn,relu,conv,bn,relu] (models/unet.py:12-21);
    decoder ``up`` is ConvTranspose2d(k=2,s=2) (models/unet.py:36)."""
    sd = state_dict
    params: Dict = {}
    stats: Dict = {}

    def x2(name, t):
        p = {"conv1": {"kernel": _conv(sd[f"{t}.0.weight"])},
             "conv2": {"kernel": _conv(sd[f"{t}.3.weight"])}}
        s = {}
        p["bn1"], s["bn1"] = _bn(sd, f"{t}.1")
        p["bn2"], s["bn2"] = _bn(sd, f"{t}.4")
        params[name] = p
        stats[name] = s

    x2("start_conv", "start_conv")
    for i in range(1, 5):
        x2(f"down{i}", f"down{i}.down_conv")
    x2("middle_conv", "middle_conv")
    for i in range(1, 5):
        params[f"up{i}_up"] = {"kernel": _convT(sd[f"up{i}.up.weight"]),
                               "bias": _vec(sd[f"up{i}.up.bias"])}
        x2(f"up{i}_conv", f"up{i}.up_conv")
    params["final_conv"] = {"kernel": _conv(sd["final_conv.weight"]),
                            "bias": _vec(sd["final_conv.bias"])}
    return params, stats


def convert_enet(state_dict: Dict) -> Tuple[Dict, Dict]:
    """Reference ENet (models/enet.py:126-218) -> segtpu ENet variables.

    Bottleneck variant (down/up/asymmetric/plain) is detected from the
    state_dict keys themselves; PReLU ``weight`` -> ``alpha``. Note the
    reference's attribute typo ``spatil_conv`` (models/enet.py:40)."""
    sd = state_dict
    params: Dict = {}
    stats: Dict = {}

    init_p = {"conv": {"kernel": _conv(sd["initial.conv.weight"]),
                       "bias": _vec(sd["initial.conv.bias"])}}
    init_s: Dict = {}
    init_p["bn"], init_s["bn"] = _bn(sd, "initial.bn")
    init_p["prelu"] = {"alpha": _vec(sd["initial.prelu.weight"])}
    params["initial"] = init_p
    stats["initial"] = init_s

    names = sorted({k.split(".")[0] for k in sd if k.startswith("bottleneck")})
    for t in names:
        bp: Dict = {}
        bs: Dict = {}

        def put_bn(name, torch_name):
            bp[name], bs[name] = _bn(sd, f"{t}.{torch_name}")

        def put_prelu(name, torch_name):
            k = f"{t}.{torch_name}.weight"
            if k in sd:  # use_prelu=False blocks have parameter-free ReLUs
                bp[name] = {"alpha": _vec(sd[k])}

        upsample = f"{t}.spatil_conv.weight" in sd
        asymmetric = f"{t}.conv2.0.weight" in sd
        if upsample:
            bp["spatial_conv"] = {"kernel": _conv(sd[f"{t}.spatil_conv.weight"])}
            put_bn("bn_up", "bn_up")
        bp["conv1"] = {"kernel": _conv(sd[f"{t}.conv1.weight"])}
        put_bn("bn1", "bn1")
        put_prelu("prelu1", "prelu1")
        if asymmetric:
            bp["conv2a"] = {"kernel": _conv(sd[f"{t}.conv2.0.weight"]),
                            "bias": _vec(sd[f"{t}.conv2.0.bias"])}
            put_bn("bn2a", "conv2.1")
            put_prelu("prelu2a", "conv2.2")
            bp["conv2b"] = {"kernel": _conv(sd[f"{t}.conv2.3.weight"]),
                            "bias": _vec(sd[f"{t}.conv2.3.bias"])}
        elif upsample:
            bp["conv2"] = {"kernel": _convT(sd[f"{t}.conv2.weight"])}
        else:
            bp["conv2"] = {"kernel": _conv(sd[f"{t}.conv2.weight"])}
        put_bn("bn2", "bn2")
        put_prelu("prelu2", "prelu2")
        bp["conv3"] = {"kernel": _conv(sd[f"{t}.conv3.weight"])}
        put_bn("bn3", "bn3")
        put_prelu("prelu3", "prelu3")
        put_prelu("prelu_out", "prelu_out")
        params[t] = bp
        stats[t] = bs

    params["fullconv"] = {"kernel": _convT(sd["fullconv.weight"])}
    return params, stats


def convert_pspnet(state_dict: Dict, arch: str = "resnet50") -> Tuple[Dict, Dict]:
    """Reference PSPNet (models/pspnet.py:41-105) -> segtpu PSPNet variables.

    The backbone keys are the reference resnet's re-prefixed under
    ``initial.``/``layerX.`` (models/pspnet.py:49-58) — un-prefix and reuse
    convert_resnet; head = _PSPModule stages + bottleneck (models/pspnet.py:11-38),
    1x1 classifier, and the auxiliary branch (models/pspnet.py:65-70)."""
    sd = state_dict
    deep = any(k.startswith("initial.0.0.") for k in sd)
    bb: Dict = {}
    for k, v in sd.items():
        # deep stem: initial.0 is the conv1 Sequential (initial.0.0.weight ->
        # conv1.0.weight); plain stem: initial.0 is conv1 itself
        # (initial.0.weight -> conv1.weight). Same prefix swap either way.
        if k.startswith("initial.0."):
            bb["conv1." + k[len("initial.0."):]] = v
        elif k.startswith("initial.1."):
            bb["bn1." + k[len("initial.1."):]] = v
        elif k.startswith("layer"):
            bb[k] = v
    bparams, bstats = convert_resnet(
        bb, arch=arch, style="encoding" if deep else "torchvision")
    params: Dict = {"backbone": bparams}
    stats: Dict = {"backbone": bstats}

    psp_p: Dict = {}
    psp_s: Dict = {}
    for i in range(4):
        t = f"master_branch.0.stages.{i}"
        psp_p[f"stage{i}_conv"] = {"kernel": _conv(sd[f"{t}.1.weight"])}
        psp_p[f"stage{i}_bn"], psp_s[f"stage{i}_bn"] = _bn(sd, f"{t}.2")
    psp_p["bottleneck_conv"] = {
        "kernel": _conv(sd["master_branch.0.bottleneck.0.weight"])}
    psp_p["bottleneck_bn"], psp_s["bottleneck_bn"] = _bn(
        sd, "master_branch.0.bottleneck.1")
    params["psp"] = psp_p
    stats["psp"] = psp_s
    params["classifier"] = {"kernel": _conv(sd["master_branch.1.weight"]),
                            "bias": _vec(sd["master_branch.1.bias"])}

    if "auxiliary_branch.0.weight" in sd:
        aux_p: Dict = {"conv": {"kernel": _conv(sd["auxiliary_branch.0.weight"])}}
        aux_s: Dict = {}
        aux_p["bn"], aux_s["bn"] = _bn(sd, "auxiliary_branch.1")
        aux_p["classifier"] = {"kernel": _conv(sd["auxiliary_branch.4.weight"]),
                               "bias": _vec(sd["auxiliary_branch.4.bias"])}
        params["aux_branch"] = aux_p
        stats["aux_branch"] = aux_s
    return params, stats


def convert_deeplab_xception(state_dict: Dict) -> Tuple[Dict, Dict]:
    """Reference DeepLabV3+ with the inline Xception backbone
    (models/deeplabv3_plus.py:336-377) -> segtpu DeepLab variables.

    Backbone keys re-use convert_xception; the head maps ASSP
    (models/deeplabv3_plus.py:260-297: 4 Sequential branches + avg_pool +
    1x1 project) and Decoder (:303-330: 48-ch low-level projection + the
    ``output`` Sequential with convs at 0/3 and the biased classifier at 7).
    """
    sd = dict(state_dict)
    bb = {k[len("backbone."):]: v for k, v in sd.items()
          if k.startswith("backbone.")}
    bparams, bstats = convert_xception(bb)
    params: Dict = {"backbone": bparams}
    stats: Dict = {"backbone": bstats}

    ap: Dict = {}
    asr: Dict = {}
    for i in range(1, 5):
        ap[f"aspp{i}_conv"] = {"kernel": _conv(sd[f"ASSP.aspp{i}.0.weight"])}
        ap[f"aspp{i}_bn"], asr[f"aspp{i}_bn"] = _bn(sd, f"ASSP.aspp{i}.1")
    ap["pool_conv"] = {"kernel": _conv(sd["ASSP.avg_pool.1.weight"])}
    ap["pool_bn"], asr["pool_bn"] = _bn(sd, "ASSP.avg_pool.2")
    ap["project_conv"] = {"kernel": _conv(sd["ASSP.conv1.weight"])}
    ap["project_bn"], asr["project_bn"] = _bn(sd, "ASSP.bn1")
    params["aspp"] = ap
    stats["aspp"] = asr

    dp: Dict = {}
    ds: Dict = {}
    dp["ll_conv"] = {"kernel": _conv(sd["decoder.conv1.weight"])}
    dp["ll_bn"], ds["ll_bn"] = _bn(sd, "decoder.bn1")
    dp["conv1"] = {"kernel": _conv(sd["decoder.output.0.weight"])}
    dp["bn1"], ds["bn1"] = _bn(sd, "decoder.output.1")
    dp["conv2"] = {"kernel": _conv(sd["decoder.output.3.weight"])}
    dp["bn2"], ds["bn2"] = _bn(sd, "decoder.output.4")
    dp["classifier"] = {"kernel": _conv(sd["decoder.output.7.weight"]),
                        "bias": _vec(sd["decoder.output.7.bias"])}
    params["decoder"] = dp
    stats["decoder"] = ds
    return params, stats


CONVERTERS = {
    "resnet": convert_resnet,
    "vgg16": convert_vgg16,
    "densenet": convert_densenet,
}

MODEL_CONVERTERS = {
    "UNet": convert_unet,
    "ENet": convert_enet,
    "PSPNet": convert_pspnet,
    "DeepLab": convert_deeplab_xception,
}
