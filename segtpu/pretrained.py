"""Pretrained-backbone wiring: honor ``arch.args.pretrained`` at train time.

The reference loads pretrained encoders inside every model constructor
(reference models/resnet.py:292-306 zip fetch, models/fcn.py:39-45 FC->conv
copy, models/deeplabv3_plus.py:171-199 Xception remap, models/gcn.py:83-90
partial stem/layer1-2 init). This sandbox has no network, so segtpu splits
that into an offline convert step (``scripts/convert_weights.py`` — torch
.pth -> orbax dir) and this online merge step, called by the Trainer when a
model was built with ``pretrained`` truthy.

Resolution rules (fail LOUDLY — the reference silently downloads; silently
training from scratch when the user asked for pretrained would be worse):

* ``pretrained: "<path>"``   — that orbax directory, as converted.
* ``pretrained: true``       — ``<root>/<checkpoint_id(model)>`` where root is
  the config key ``pretrained_dir`` or ``$SEGTPU_PRETRAINED_DIR``.

``checkpoint_id`` naming convention (what to pass to convert_weights.py
--output):

=================  ==========================  ==========================
model              id                          convert_weights.py flags
=================  ==========================  ==========================
PSPNet             ``<backbone>s``             --family resnet --style encoding
UNetResnet         ``<backbone>s``             --family resnet --style encoding
GCN / ResnetGCN    ``<backbone>``              --family resnet
UperNet            ``<backbone>``              --family resnet
SegResNet          ``resnet50``                --family resnet
DeepLab (resnet)   ``<backbone>``              --family resnet
DeepLab (xception) ``xception``                --family xception
DeepLab_DUC_HDC    ``<backbone>``              --family resnet
PSPDenseNet        ``<backbone>``              --family densenet
SegNet             ``vgg16_bn``                --family vgg16 --bn
FCN8               ``vgg16``                   --family vgg16 (incl. classifier)
=================  ==========================  ==========================
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional

import jax
import numpy as np

logger = logging.getLogger("segtpu.pretrained")


# ---------------------------------------------------------------------------
# What checkpoint does this model want?

def checkpoint_id(model) -> Optional[str]:
    """Converted-checkpoint directory name for ``model`` (None: the model has
    no pretrained encoder — reference trains UNet/ENet from scratch)."""
    name = type(model).__name__
    backbone = getattr(model, "backbone", None)
    if name in ("PSPNet", "UNetResnet"):
        return f"{backbone}s"  # encoding deep-base zoo (reference resnet.py:24-26)
    if name in ("GCN", "ResnetGCN", "UperNet", "DeepLab_DUC_HDC", "DUC_HDC"):
        return backbone
    if name == "SegResNet":
        return "resnet50"
    if name == "DeepLabV3Plus" or name.startswith("DeepLab"):
        return backbone if (backbone and "resnet" in backbone) else "xception"
    if name == "PSPDenseNet":
        return backbone
    if name == "SegNet":
        return "vgg16_bn"
    if name == "FCN8":
        return "vgg16"
    return None


# ---------------------------------------------------------------------------
# Merge strategies

def _checked(old, new):
    if np.shape(old) != np.shape(new):
        raise ValueError(
            f"pretrained shape mismatch: model {np.shape(old)} vs "
            f"checkpoint {np.shape(new)}")
    import jax.numpy as jnp

    return jnp.asarray(new, dtype=np.asarray(old).dtype)


def _merge_subtree(tree: Dict, new: Dict, *, partial: bool = False) -> Dict:
    """Replace leaves of ``tree`` with same-named leaves of ``new``.

    ``partial=True`` ignores checkpoint keys absent from the model (ResnetGCN
    keeps only stem+layer1/2 of a full resnet, reference models/gcn.py:83-90);
    model keys absent from the checkpoint always stay at their init values.
    """
    out = dict(tree)
    for k, v in new.items():
        if k not in out:
            if partial:
                continue
            raise KeyError(f"checkpoint key {k!r} not in model tree "
                           f"(model keys: {sorted(out)[:8]}...)")
        if isinstance(v, dict) and isinstance(out[k], dict):
            out[k] = _merge_subtree(out[k], v, partial=partial)
        else:
            out[k] = _checked(out[k], v)
    return out


def _segresnet_remap(tree: Dict) -> Dict:
    """convert_resnet keys -> SegResNet's flat ``backbone_*`` names
    (models/segnet.py:163-179; the encoder is torchvision resnet50 with the
    stem pool swapped for an argmax pool, reference models/segnet.py:203-215)."""
    out = {}
    for k, v in tree.items():
        if k == "stem_conv1":
            out["backbone_stem_conv"] = v
        elif k == "stem_bn":
            out["backbone_stem_bn"] = v
        elif k.startswith("layer"):
            out[f"backbone_{k}"] = v
        # encoding-only stem keys can't appear (id is torchvision resnet50)
    return out


def apply_pretrained(state, model, path: str):
    """Merge the converted checkpoint at ``path`` into ``state``.

    Handles three layouts: the common ``backbone`` scope, SegResNet's flat
    ``backbone_*`` prefix, and FCN8's extra classifier convs (saved under
    ``extras`` by convert_weights.py, reference models/fcn.py:39-45).
    """
    import orbax.checkpoint as ocp

    restored = ocp.StandardCheckpointer().restore(os.path.abspath(path))
    bb_params = restored.get("params", {})
    bb_stats = restored.get("batch_stats", {})
    extras = restored.get("extras", {})

    name = type(model).__name__
    new_params = dict(state.params)
    new_stats = dict(state.batch_stats)
    partial = name == "ResnetGCN" or (
        name == "GCN" and getattr(model, "use_resnet_gcn", False))
    if partial:
        # ResnetGCN keeps only stem+layer1/2 of the pretrained resnet
        # (reference models/gcn.py:83-90); its layer3/4 are GCN bottlenecks
        # whose names collide with the checkpoint's resnet blocks.
        keep = ("stem_", "layer1_", "layer2_")
        bb_params = {k: v for k, v in bb_params.items() if k.startswith(keep)}
        bb_stats = {k: v for k, v in bb_stats.items() if k.startswith(keep)}

    if name == "SegResNet":
        new_params = _merge_subtree(new_params, _segresnet_remap(bb_params))
        new_stats = _merge_subtree(new_stats, _segresnet_remap(bb_stats))
    else:
        if "backbone" not in new_params:
            raise KeyError(
                f"{name} has no 'backbone' scope to load pretrained weights "
                f"into (params keys: {sorted(new_params)})")
        new_params["backbone"] = _merge_subtree(
            new_params["backbone"], bb_params, partial=partial)
        if bb_stats:
            if "backbone" in new_stats:
                new_stats["backbone"] = _merge_subtree(
                    new_stats["backbone"], bb_stats, partial=partial)
            elif not partial:
                raise KeyError(f"{name} has no 'backbone' batch_stats scope")

    if name == "FCN8":
        if not extras:
            raise ValueError(
                "FCN8 pretrained checkpoint is missing the VGG classifier "
                "convs ('extras'); re-run scripts/convert_weights.py --family "
                "vgg16 on a FULL torchvision vgg16 state_dict (reference "
                "models/fcn.py:39-45 copies fc6/fc7 into conv6/conv7)")
        new_params = _merge_subtree(new_params, dict(extras))
    elif extras:
        new_params = _merge_subtree(new_params, dict(extras), partial=True)

    n = sum(int(np.size(x)) for x in jax.tree_util.tree_leaves(bb_params))
    logger.info(f"loaded pretrained backbone from {path} ({n:,} params)")
    return state.replace(params=new_params, batch_stats=new_stats)


# ---------------------------------------------------------------------------
# Resolution + entry point

def resolve_path(model, config: Dict) -> Optional[str]:
    """Path of the converted checkpoint this model/config asks for; None if
    ``pretrained`` is falsy. Raises (loudly) when asked-for weights are
    unavailable — never silently train from scratch."""
    pre = getattr(model, "pretrained", False)
    if not pre:
        return None
    if isinstance(pre, str):
        if not os.path.isdir(pre):
            raise FileNotFoundError(
                f"arch.args.pretrained points at {pre!r} which is not a "
                f"converted-checkpoint directory (create one with "
                f"scripts/convert_weights.py)")
        return pre
    cid = checkpoint_id(model)
    if cid is None:
        raise ValueError(
            f"{type(model).__name__} has no pretrained encoder (the reference "
            f"trains it from scratch); set arch.args.pretrained to false")
    root = config.get("pretrained_dir") or os.environ.get(
        "SEGTPU_PRETRAINED_DIR")
    if not root:
        raise RuntimeError(
            f"arch.args.pretrained is true but no weights location is "
            f"configured. Set the config key 'pretrained_dir' (or "
            f"$SEGTPU_PRETRAINED_DIR) to a directory containing "
            f"'{cid}' (converted with scripts/convert_weights.py), pass a "
            f"direct path in arch.args.pretrained, or set pretrained: false.")
    path = os.path.join(root, cid)
    if not os.path.isdir(path):
        raise FileNotFoundError(
            f"pretrained checkpoint {path!r} not found. Convert one with:\n"
            f"  python scripts/convert_weights.py --family <family> "
            f"--arch <arch> --input <torch .pth> --output {path}\n"
            f"(see segtpu/pretrained.py docstring for the id table)")
    return path


def maybe_load_pretrained(state, model, config: Dict):
    """Trainer hook: returns ``state`` with pretrained weights merged when the
    model asks for them (reference loads in-constructor, e.g.
    models/resnet.py:292-306); no-op when ``pretrained`` is falsy."""
    path = resolve_path(model, config)
    if path is None:
        return state
    return apply_pretrained(state, model, path)
