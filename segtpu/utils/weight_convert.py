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


def _initial_resnet_backbone(sd: Dict, arch: str, initial: str = "initial"
                             ) -> Tuple[Dict, Dict]:
    """Re-prefixed reference-resnet backbone keys -> ResNetFeatures trees.

    Several reference models store ``nn.Sequential(*children[:4])`` of a
    resnet as ``<initial>.`` plus the untouched ``layerX.`` modules
    (models/pspnet.py:49-58, models/unet.py:131-140, models/upernet.py:47-58,
    models/deeplabv3_plus.py:18-33, models/duc_hdc.py:59-75). Detects the
    deep (encoding) vs plain (torchvision) stem from the key shape and
    reuses convert_resnet."""
    deep = any(k.startswith(f"{initial}.0.0.") for k in sd)
    bb: Dict = {}
    for k, v in sd.items():
        if k.startswith(f"{initial}.0."):
            bb["conv1." + k[len(f"{initial}.0."):]] = v
        elif k.startswith(f"{initial}.1."):
            bb["bn1." + k[len(f"{initial}.1."):]] = v
        elif k.startswith("layer") and not k.startswith(initial):
            bb[k] = v
    return convert_resnet(bb, arch=arch,
                          style="encoding" if deep else "torchvision")


def convert_unet_resnet(state_dict: Dict, arch: str = "resnet50"
                        ) -> Tuple[Dict, Dict]:
    """Reference UNetResnet (models/unet.py:126-209) -> segtpu UNetResnet.

    Encoder: local encoding-style resnet re-prefixed under ``initial.``/
    ``layerX.`` (models/unet.py:131-140); decoder: convN (biased 3x3) +
    upconvN (bias-free ConvTranspose k=4,s=2,p=1), classifier conv7 is
    bias-free 1x1 (models/unet.py:143-159)."""
    sd = state_dict
    bparams, bstats = _initial_resnet_backbone(sd, arch)
    params: Dict = {"backbone": bparams}
    stats: Dict = {"backbone": bstats}
    for i in range(1, 7):
        params[f"conv{i}"] = {"kernel": _conv(sd[f"conv{i}.weight"]),
                              "bias": _vec(sd[f"conv{i}.bias"])}
    for i in range(1, 6):
        params[f"upconv{i}"] = {"kernel": _convT(sd[f"upconv{i}.weight"])}
    params["conv7"] = {"kernel": _conv(sd["conv7.weight"])}
    return params, stats


def convert_gcn(state_dict: Dict, arch: str = "resnet50") -> Tuple[Dict, Dict]:
    """Reference GCN with the torchvision-resnet backbone
    (models/gcn.py:114-141,191-233) -> segtpu GCN variables.

    Decoder: gcnN dual-path separable blocks (biased convs, :147-170), brN
    boundary-refinement conv pairs (:172-189), biased 1x1 final_conv; the
    optional deconN ConvTranspose stack when ``use_deconv`` was set."""
    sd = state_dict
    bb = {k[len("backbone."):]: v for k, v in sd.items()
          if k.startswith("backbone.")}
    bparams, bstats = _initial_resnet_backbone(bb, arch)
    params: Dict = {"backbone": bparams}
    stats: Dict = {"backbone": bstats}

    def biased(t):
        return {"kernel": _conv(sd[f"{t}.weight"]),
                "bias": _vec(sd[f"{t}.bias"])}

    for i in range(1, 5):
        params[f"gcn{i}"] = {n: biased(f"gcn{i}.{n}")
                             for n in ("conv11", "conv12", "conv21", "conv22")}
    for i in range(1, 10):
        params[f"br{i}"] = {"conv1": biased(f"br{i}.conv1"),
                            "conv2": biased(f"br{i}.conv2")}
    for i in range(1, 6):
        k = f"decon{i}.weight"
        if k in sd:
            params[f"decon{i}"] = {"kernel": _convT(sd[k])}
    params["final_conv"] = biased("final_conv")
    return params, stats


def convert_upernet(state_dict: Dict, arch: str = "resnet101"
                    ) -> Tuple[Dict, Dict]:
    """Reference UperNet (models/upernet.py:119-154) -> segtpu UperNet.

    PPN = PSPModule with stages Sequential(pool, conv@1, bn@2) and
    bottleneck Sequential(conv@0, bn@1) (:8-38); FPN = conv1x1 laterals +
    smooth convs + conv_fusion (:92-117). The reference's smooth_conv is ONE
    shared module repeated ([module]*3, :99) — segtpu has per-level smooths,
    so every smoothN loads the same tensors (behaviorally identical)."""
    sd = state_dict
    bb = {k[len("backbone."):]: v for k, v in sd.items()
          if k.startswith("backbone.")}
    bparams, bstats = _initial_resnet_backbone(bb, arch)
    params: Dict = {"backbone": bparams}
    stats: Dict = {"backbone": bstats}

    pp: Dict = {}
    ps: Dict = {}
    for i in range(4):
        t = f"PPN.stages.{i}"
        pp[f"stage{i}_conv"] = {"kernel": _conv(sd[f"{t}.1.weight"])}
        pp[f"stage{i}_bn"], ps[f"stage{i}_bn"] = _bn(sd, f"{t}.2")
    pp["bottleneck_conv"] = {"kernel": _conv(sd["PPN.bottleneck.0.weight"])}
    pp["bottleneck_bn"], ps["bottleneck_bn"] = _bn(sd, "PPN.bottleneck.1")
    params["ppn"] = pp
    stats["ppn"] = ps

    fp: Dict = {}
    fs: Dict = {}
    for i in range(3):
        fp[f"lateral{i}"] = {"kernel": _conv(sd[f"FPN.conv1x1.{i}.weight"]),
                             "bias": _vec(sd[f"FPN.conv1x1.{i}.bias"])}
        fp[f"smooth{i}"] = {"kernel": _conv(sd[f"FPN.smooth_conv.{i}.weight"]),
                            "bias": _vec(sd[f"FPN.smooth_conv.{i}.bias"])}
    fp["fusion_conv"] = {"kernel": _conv(sd["FPN.conv_fusion.0.weight"])}
    fp["fusion_bn"], fs["fusion_bn"] = _bn(sd, "FPN.conv_fusion.1")
    params["fpn"] = fp
    stats["fpn"] = fs
    params["head"] = {"kernel": _conv(sd["head.weight"]),
                      "bias": _vec(sd["head.bias"])}
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
    _deeplab_head(sd, params, stats)
    return params, stats


def _deeplab_head(sd: Dict, params: Dict, stats: Dict) -> None:
    """Shared DeepLabV3+ head mapping: ASSP (models/deeplabv3_plus.py:260-297)
    + Decoder (:303-330). Fills ``params``/``stats`` in place."""
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


def convert_deeplab_resnet(state_dict: Dict, arch: str = "resnet101"
                           ) -> Tuple[Dict, Dict]:
    """Reference DeepLabV3+ with the torchvision-ResNet backbone
    (models/deeplabv3_plus.py:14-63: ``layer0`` stem + dilated layer3/4)
    -> segtpu DeepLab variables. Head mapping shared with the xception
    variant."""
    sd = dict(state_dict)
    bb = {k[len("backbone."):]: v for k, v in sd.items()
          if k.startswith("backbone.")}
    bparams, bstats = _initial_resnet_backbone(bb, arch, initial="layer0")
    params: Dict = {"backbone": bparams}
    stats: Dict = {"backbone": bstats}
    _deeplab_head(sd, params, stats)
    return params, stats


def convert_fcn8(state_dict: Dict) -> Tuple[Dict, Dict]:
    """Reference FCN8 (models/fcn.py:9-114) -> segtpu FCN8 variables.

    VGG features live re-sliced under pool3/pool4/pool5 Sequentials
    (models/fcn.py:25-27, original feature indices preserved inside each
    slice); FC6/FC7 were already copied into the ``output`` convs at
    construction (:39-45); the frozen bilinear upsamplers (:55-73) have no
    segtpu parameters (fixed resize kernels) and are skipped."""
    sd = state_dict
    params: Dict = {}
    # (segtpu stage, [(ci, torch key prefix)...]) — conv positions within the
    # reference's re-sliced Sequentials
    plan = [
        ("stage1", ["pool3.0", "pool3.2"]),
        ("stage2", ["pool3.5", "pool3.7"]),
        ("stage3", ["pool3.10", "pool3.12", "pool3.14"]),
        ("stage4", ["pool4.0", "pool4.2", "pool4.4"]),
        ("stage5", ["pool5.0", "pool5.2", "pool5.4"]),
    ]
    bb: Dict = {}
    for stage, prefixes in plan:
        bb[stage] = {
            f"conv{ci}": {"kernel": _conv(sd[f"{t}.weight"]),
                          "bias": _vec(sd[f"{t}.bias"])}
            for ci, t in enumerate(prefixes)}
    params["backbone"] = bb
    for name, t in (("backbone_conv6", "output.0"),
                    ("backbone_conv7", "output.3"),
                    ("backbone_score", "output.6"),
                    ("adj_pool3", "adj_pool3"),
                    ("adj_pool4", "adj_pool4")):
        params[name] = {"kernel": _conv(sd[f"{t}.weight"]),
                        "bias": _vec(sd[f"{t}.bias"])}
    return params, {}


def convert_segnet(state_dict: Dict) -> Tuple[Dict, Dict]:
    """Reference SegNet (models/segnet.py:13-132) -> segtpu SegNet variables.

    Encoder = VGG16-BN stages re-sliced as stageN_encoder Sequentials
    (conv at 3k, bn at 3k+1); decoder = the rebuilt mirrored stages
    (:37-61), with the classifier appended to stage5_decoder."""
    sd = state_dict
    params: Dict = {}
    stats: Dict = {}

    enc_widths = VGG16_STAGES
    bb_p: Dict = {}
    bb_s: Dict = {}
    for si, widths in enumerate(enc_widths):
        sp: Dict = {}
        ss: Dict = {}
        for ci in range(len(widths)):
            t = f"stage{si + 1}_encoder.{3 * ci}"
            sp[f"conv{ci}"] = {"kernel": _conv(sd[f"{t}.weight"]),
                               "bias": _vec(sd[f"{t}.bias"])}
            sp[f"bn{ci}"], ss[f"bn{ci}"] = _bn(sd, f"stage{si + 1}_encoder.{3 * ci + 1}")
        bb_p[f"stage{si + 1}"] = sp
        bb_s[f"stage{si + 1}"] = ss
    params["backbone"] = bb_p
    stats["backbone"] = bb_s

    dec_counts = (3, 3, 3, 2, 2)
    for si, n in enumerate(dec_counts):
        dp: Dict = {}
        ds: Dict = {}
        for ci in range(n):
            t = f"stage{si + 1}_decoder.{3 * ci}"
            dp[f"conv{ci}"] = {"kernel": _conv(sd[f"{t}.weight"]),
                               "bias": _vec(sd[f"{t}.bias"])}
            dp[f"bn{ci}"], ds[f"bn{ci}"] = _bn(sd, f"stage{si + 1}_decoder.{3 * ci + 1}")
        params[f"decoder{si + 1}"] = dp
        stats[f"decoder{si + 1}"] = ds
    params["classifier"] = {"kernel": _conv(sd["stage5_decoder.6.weight"]),
                            "bias": _vec(sd["stage5_decoder.6.bias"])}
    return params, stats


def convert_segresnet(state_dict: Dict) -> Tuple[Dict, Dict]:
    """Reference SegResNet (models/segnet.py:200-277) -> segtpu SegResNet.

    Encoder = torchvision resnet50 re-packed as first_conv (stem) + encoder
    (layer Sequentials); decoder = reversed untrained blocks + Decoder/Last
    bottlenecks (:216-231); last_conv = ConvTranspose + classifier."""
    sd = state_dict
    params: Dict = {}
    stats: Dict = {}
    params["backbone_stem_conv"] = {"kernel": _conv(sd["first_conv.0.weight"])}
    params["backbone_stem_bn"], stats["backbone_stem_bn"] = _bn(sd, "first_conv.1")

    def bottleneck(name, t, transposed_conv2=False, shortcut=None):
        bp: Dict = {}
        bs: Dict = {}
        for ci in (1, 2, 3):
            w = sd[f"{t}.conv{ci}.weight"]
            bp[f"conv{ci}"] = {
                "kernel": _convT(w) if (transposed_conv2 and ci == 2) else _conv(w)}
            bp[f"bn{ci}"], bs[f"bn{ci}"] = _bn(sd, f"{t}.bn{ci}")
        if shortcut == "downsample":
            bp["downsample_conv"] = {"kernel": _conv(sd[f"{t}.downsample.0.weight"])}
            bp["downsample_bn"], bs["downsample_bn"] = _bn(sd, f"{t}.downsample.1")
        elif shortcut == "transposed":
            bp["shortcut_conv"] = {"kernel": _convT(sd[f"{t}.downsample.0.weight"])}
            bp["shortcut_bn"], bs["shortcut_bn"] = _bn(sd, f"{t}.downsample.1")
        elif shortcut == "plain":
            bp["shortcut_conv"] = {"kernel": _conv(sd[f"{t}.downsample.0.weight"])}
            bp["shortcut_bn"], bs["shortcut_bn"] = _bn(sd, f"{t}.downsample.1")
        params[name] = bp
        stats[name] = bs

    counts = (3, 4, 6, 3)
    for li in range(4):
        for bi in range(counts[li]):
            t = f"encoder.{li}.{bi}"
            bottleneck(f"backbone_layer{li + 1}_{bi}", t,
                       shortcut="downsample"
                       if f"{t}.downsample.0.weight" in sd else None)

    dec_reps = (2, 5, 3)
    for si, reps in enumerate(dec_reps):
        for bi in range(reps):
            bottleneck(f"decoder{si + 1}_{bi}", f"decoder.{si}.{bi}")
        bottleneck(f"decoder{si + 1}_up", f"decoder.{si}.{reps}",
                   transposed_conv2=True, shortcut="transposed")
    for bi in range(2):
        bottleneck(f"decoder4_{bi}", f"decoder.3.{bi}")
    bottleneck("decoder4_last", "decoder.3.2", shortcut="plain")

    params["last_up"] = {"kernel": _convT(sd["last_conv.0.weight"])}
    params["classifier"] = {"kernel": _conv(sd["last_conv.1.weight"]),
                            "bias": _vec(sd["last_conv.1.bias"])}
    return params, stats


def convert_duc_hdc(state_dict: Dict, arch: str = "resnet101"
                    ) -> Tuple[Dict, Dict]:
    """Reference DeepLab_DUC_HDC (models/duc_hdc.py:214-244) -> segtpu.

    Backbone under ``layer0``/``layerX`` (:59-75); 6-branch ASSP (:126-174);
    decoder with its inner DUC(x2) (:180-208); DUC_out(x4) head (:223)."""
    sd = state_dict
    bb = {k[len("backbone."):]: v for k, v in sd.items()
          if k.startswith("backbone.")}
    bparams, bstats = _initial_resnet_backbone(bb, arch, initial="layer0")
    params: Dict = {"backbone": bparams}
    stats: Dict = {"backbone": bstats}

    ap: Dict = {}
    asr: Dict = {}
    for i in range(1, 7):
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
    dp["duc"] = {"conv": {"kernel": _conv(sd["decoder.DUC.conv.weight"])}}
    duc_bn_p, duc_bn_s = _bn(sd, "decoder.DUC.bn")
    dp["duc"]["bn"] = duc_bn_p
    ds["duc"] = {"bn": duc_bn_s}
    dp["conv1"] = {"kernel": _conv(sd["decoder.output.0.weight"])}
    dp["bn1"], ds["bn1"] = _bn(sd, "decoder.output.1")
    dp["conv2"] = {"kernel": _conv(sd["decoder.output.3.weight"])}
    dp["bn2"], ds["bn2"] = _bn(sd, "decoder.output.4")
    dp["classifier"] = {"kernel": _conv(sd["decoder.output.7.weight"]),
                        "bias": _vec(sd["decoder.output.7.bias"])}
    params["decoder"] = dp
    stats["decoder"] = ds

    params["duc_out"] = {"conv": {"kernel": _conv(sd["DUC_out.conv.weight"])}}
    out_bn_p, out_bn_s = _bn(sd, "DUC_out.bn")
    params["duc_out"]["bn"] = out_bn_p
    stats["duc_out"] = {"bn": out_bn_s}
    return params, stats


def convert_pspdensenet(state_dict: Dict, arch: str = "densenet201",
                        pretrained_stem: bool = False) -> Tuple[Dict, Dict]:
    """Reference PSPDenseNet (models/pspnet.py:115-205) -> segtpu PSPDenseNet.

    Backbone = densenet blocks re-attached as block1..4/transition1..3 (the
    transition2/3 pools dropped, :145-148); stem = block0 (3x3-stack when
    trained from scratch, :125-135, or the re-sliced densenet stem);
    head/aux identical in shape to PSPNet's."""
    sd = state_dict
    from segtpu.backbones.densenet import DENSENET_CONFIG

    growth, blocks, _stem = DENSENET_CONFIG[arch]
    bp: Dict = {}
    bs: Dict = {}
    if pretrained_stem:
        bp["stem_conv"] = {"kernel": _conv(sd["block0.0.weight"])}
        bp["stem_bn"], bs["stem_bn"] = _bn(sd, "block0.1")
    else:
        for i, (c, b) in enumerate(((0, 1), (3, 4), (6, 7))):
            bp[f"stem_conv{i}"] = {"kernel": _conv(sd[f"block0.{c}.weight"])}
            bp[f"stem_bn{i}"], bs[f"stem_bn{i}"] = _bn(sd, f"block0.{b}")

    for bi in range(4):
        blk_p: Dict = {}
        blk_s: Dict = {}
        for li in range(blocks[bi]):
            t = f"block{bi + 1}.denselayer{li + 1}"
            lp: Dict = {}
            ls: Dict = {}
            for norm, conv in (("norm1", "conv1"), ("norm2", "conv2")):
                lp[norm], ls[norm] = _bn(sd, f"{t}.{norm}")
                lp[conv] = {"kernel": _conv(sd[f"{t}.{conv}.weight"])}
            blk_p[f"denselayer{li + 1}"] = lp
            blk_s[f"denselayer{li + 1}"] = ls
        bp[f"denseblock{bi + 1}"] = blk_p
        bs[f"denseblock{bi + 1}"] = blk_s
    # transition1 keeps the full module (norm/conv names); 2/3 are re-sliced
    # Sequentials (norm at 0, conv at 2)
    bp["transition1"] = {"conv": {"kernel": _conv(sd["transition1.conv.weight"])}}
    t1n_p, t1n_s = _bn(sd, "transition1.norm")
    bp["transition1"]["norm"] = t1n_p
    bs["transition1"] = {"norm": t1n_s}
    for i in (2, 3):
        bp[f"transition{i}"] = {
            "conv": {"kernel": _conv(sd[f"transition{i}.2.weight"])}}
        tn_p, tn_s = _bn(sd, f"transition{i}.0")
        bp[f"transition{i}"]["norm"] = tn_p
        bs[f"transition{i}"] = {"norm": tn_s}
    params: Dict = {"backbone": bp}
    stats: Dict = {"backbone": bs}

    pp: Dict = {}
    ps: Dict = {}
    for i in range(4):
        t = f"master_branch.0.stages.{i}"
        pp[f"stage{i}_conv"] = {"kernel": _conv(sd[f"{t}.1.weight"])}
        pp[f"stage{i}_bn"], ps[f"stage{i}_bn"] = _bn(sd, f"{t}.2")
    pp["bottleneck_conv"] = {
        "kernel": _conv(sd["master_branch.0.bottleneck.0.weight"])}
    pp["bottleneck_bn"], ps["bottleneck_bn"] = _bn(
        sd, "master_branch.0.bottleneck.1")
    params["psp"] = pp
    stats["psp"] = ps
    params["classifier"] = {"kernel": _conv(sd["master_branch.1.weight"]),
                            "bias": _vec(sd["master_branch.1.bias"])}

    aux_p: Dict = {"conv": {"kernel": _conv(sd["auxiliary_branch.0.weight"])}}
    aux_s: Dict = {}
    aux_p["bn"], aux_s["bn"] = _bn(sd, "auxiliary_branch.1")
    aux_p["classifier"] = {"kernel": _conv(sd["auxiliary_branch.4.weight"]),
                           "bias": _vec(sd["auxiliary_branch.4.bias"])}
    params["aux_branch"] = aux_p
    stats["aux_branch"] = aux_s
    return params, stats


CONVERTERS = {
    "resnet": convert_resnet,
    "vgg16": convert_vgg16,
    "densenet": convert_densenet,
}

MODEL_CONVERTERS = {
    "UNet": convert_unet,
    "UNetResnet": convert_unet_resnet,
    "ENet": convert_enet,
    "PSPNet": convert_pspnet,
    "PSPDenseNet": convert_pspdensenet,
    "DeepLab": convert_deeplab_xception,
    "DeepLab-resnet": convert_deeplab_resnet,
    "FCN8": convert_fcn8,
    "SegNet": convert_segnet,
    "SegResNet": convert_segresnet,
    "GCN": convert_gcn,
    "UperNet": convert_upernet,
    "DeepLab_DUC_HDC": convert_duc_hdc,
}
