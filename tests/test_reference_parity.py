"""Full-model numerical parity vs the torch reference implementation.

The strongest in-sandbox mIoU-parity proxy: instantiate the *reference* torch
model (/root/reference, torch-CPU), convert its real ``state_dict()`` with
segtpu's converters, load into the segtpu model, and assert eval-mode logits
agree. Also diffs the vendored Lovász loss and the train/val augmentation
pipelines function-by-function. Covers the torchvision-free reference models
(torchvision is not installed; it is stubbed only so reference modules that
import it at module scope can load — those code paths are never executed).
"""

import sys
import types

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from segtpu.models import get_model
from segtpu.utils import weight_convert as wc

REF = "/root/reference"


def _setup_reference():
    if REF not in sys.path:
        # APPEND, don't prepend: the repo root must keep winning name
        # lookups (`import train` is segtpu's CLI; prepending made later
        # tests import the reference's train.py instead). The reference's
        # own module names (models, base, dataloaders) don't exist at the
        # repo root, so appending resolves them fine.
        sys.path.append(REF)
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tr = types.ModuleType("torchvision.transforms")
        mo = types.ModuleType("torchvision.models")

        class _Noop:
            def __init__(self, *a, **k):
                pass

            def __call__(self, x):
                return x

        tr.ToTensor = _Noop
        tr.Normalize = _Noop
        tv.transforms, tv.models = tr, mo
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tr
        sys.modules["torchvision.models"] = mo


@pytest.fixture(scope="module")
def ref():
    _setup_reference()
    import models as ref_models  # /root/reference/models

    return ref_models


def _sd_numpy(m):
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


def _assert_same_structure(model, variables, x):
    """Converted tree must have exactly the model's params/batch_stats keys."""
    import flax.traverse_util as tu
    import jax

    init = model.init({"params": jax.random.PRNGKey(0),
                       "dropout": jax.random.PRNGKey(0)},
                      jnp.asarray(x), train=False)
    for col in ("params", "batch_stats"):
        want = set(tu.flatten_dict(init.get(col, {})).keys())
        got = set(tu.flatten_dict(variables.get(col, {})).keys())
        assert want == got, (
            f"{col} mismatch:\n missing={sorted(want - got)[:10]}\n "
            f"extra={sorted(got - want)[:10]}")


def _compare(ref_model, seg_model, converter, hw=64, num_classes=7,
             atol=2e-4, in_channels=3, seed=0):
    ref_model.eval()
    variables = {}
    variables["params"], variables["batch_stats"] = converter(
        _sd_numpy(ref_model))

    rng = np.random.default_rng(seed)
    x = rng.normal(size=(2, hw, hw, in_channels)).astype(np.float32)
    _assert_same_structure(seg_model, variables, x)

    with torch.no_grad():
        ref_out = ref_model(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    if isinstance(ref_out, (tuple, list)):
        ref_out = ref_out[0]
    ref_out = np.transpose(ref_out.numpy(), (0, 2, 3, 1))

    seg_out = np.asarray(
        seg_model.apply(variables, jnp.asarray(x), train=False)["out"],
        np.float32)
    assert seg_out.shape == ref_out.shape
    diff = np.max(np.abs(seg_out - ref_out))
    scale = max(np.max(np.abs(ref_out)), 1e-6)
    assert diff < atol * max(scale, 1.0), (
        f"max |logit diff| {diff:.2e} (ref scale {scale:.2e})")


def test_unet_full_model_parity(ref):
    torch.manual_seed(0)
    ref_model = ref.UNet(num_classes=7)
    seg_model = get_model("UNet", num_classes=7)
    _compare(ref_model, seg_model, wc.convert_unet)


def test_enet_full_model_parity(ref):
    torch.manual_seed(0)
    ref_model = ref.ENet(num_classes=7)
    seg_model = get_model("ENet", num_classes=7)
    _compare(ref_model, seg_model, wc.convert_enet)


def test_pspnet_full_model_parity(ref):
    torch.manual_seed(0)
    ref_model = ref.PSPNet(num_classes=7, backbone="resnet50",
                           pretrained=False, use_aux=True)
    seg_model = get_model("PSPNet", num_classes=7, backbone="resnet50",
                          use_aux=True)
    # deeper net, fp32 error accumulates across ~50 convs
    _compare(ref_model, seg_model, wc.convert_pspnet, atol=5e-4)


def test_deeplab_xception_full_model_parity(ref):
    """Reference DeepLabV3+ with its inline (torchvision-free) Xception
    backbone (models/deeplabv3_plus.py:336-377, pretrained=False)."""
    torch.manual_seed(0)
    ref_model = ref.DeepLab(num_classes=7, backbone="xception",
                            pretrained=False, output_stride=16)
    seg_model = get_model("DeepLab", num_classes=7, backbone="xception",
                          output_stride=16)
    # 70+ convs deep; fp32 error accumulates like PSPNet's
    _compare(ref_model, seg_model, wc.convert_deeplab_xception, atol=5e-4)


def test_convert_resnet_against_real_torch_keys(ref):
    """The backbone converter consumed by pretrained loading, validated
    against REAL torch state_dicts (reference models/resnet.py — both the
    encoding deep-base and the torchvision-compatible plain layout), not
    against its own inverse."""
    from segtpu.backbones.resnet import ResNetFeatures
    import flax.traverse_util as tu
    import jax

    torch.manual_seed(0)
    cases = [
        ("resnet18", ref.resnet.resnet18(pretrained=False), "torchvision"),
        ("resnet50", ref.resnet.resnet50(pretrained=False), "encoding"),
    ]
    for arch, tmodel, style in cases:
        params, stats = wc.convert_resnet(_sd_numpy(tmodel), arch=arch,
                                          style=style)
        feats = ResNetFeatures(arch=arch, style=style)
        init = feats.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)
        for col, tree in (("params", params), ("batch_stats", stats)):
            want = tu.flatten_dict(init[col])
            got = tu.flatten_dict(tree)
            assert set(want) == set(got), (arch, col)
            for k in want:
                assert np.shape(want[k]) == np.shape(got[k]), (arch, col, k)


# ---------------------------------------------------------------------------
# Function-level diffs: Lovász loss, augmentation pipeline


def test_lovasz_softmax_matches_vendored(ref):
    import utils.lovasz_losses as ref_ll  # /root/reference/utils

    from segtpu.losses import lovasz_softmax

    rng = np.random.default_rng(1)
    logits = rng.normal(size=(2, 12, 12, 5)).astype(np.float32) * 3
    labels = rng.integers(0, 5, size=(2, 12, 12)).astype(np.int64)
    labels[0, :3, :3] = 255  # ignore region

    t_logits = torch.from_numpy(np.transpose(logits, (0, 3, 1, 2)))
    t_probas = torch.softmax(t_logits, dim=1)
    ref_loss = float(ref_ll.lovasz_softmax(
        t_probas, torch.from_numpy(labels), classes="present",
        per_image=False, ignore=255))

    seg_loss = float(lovasz_softmax(jnp.asarray(logits), jnp.asarray(labels),
                                    ignore_index=255, per_image=False))
    assert abs(seg_loss - ref_loss) < 1e-5, (seg_loss, ref_loss)

    # per_image variant too (reference utils/lovasz_losses.py:153-162)
    ref_pi = float(ref_ll.lovasz_softmax(
        t_probas, torch.from_numpy(labels), classes="present",
        per_image=True, ignore=255))
    seg_pi = float(lovasz_softmax(jnp.asarray(logits), jnp.asarray(labels),
                                  ignore_index=255, per_image=True))
    assert abs(seg_pi - ref_pi) < 1e-5, (seg_pi, ref_pi)


def _make_ref_dataset(ref_base, image, label, **kw):
    class _Fixed(ref_base.BaseDataSet):
        def _set_files(self):
            self.files = [0]

        def _load_data(self, index):
            return image.copy(), label.copy(), "0"

    return _Fixed(root=".", split="train", mean=[0.0] * 3, std=[1.0] * 3, **kw)


def _make_seg_dataset(image, label, **kw):
    from segtpu.data.base import BaseDataset

    class _Fixed(BaseDataset):
        num_classes = 5

        def _set_files(self):
            self.files = [0]

        def _load_data(self, index):
            return image.copy(), label.copy(), "0"

    return _Fixed(root=".", split="train", mean=[0.0] * 3, std=[1.0] * 3, **kw)


def test_train_augmentation_matches_reference(ref):
    """Same seeded RNG -> bit-identical augmented (image, label) pairs
    (reference base/base_dataset.py:63-120; the RNG draw order is part of the
    parity contract)."""
    import random

    import base as ref_base  # /root/reference/base

    rng = np.random.default_rng(2)
    image = rng.integers(0, 255, size=(83, 97, 3)).astype(np.uint8)
    image = np.asarray(image, np.float32)
    label = rng.integers(0, 5, size=(83, 97)).astype(np.uint8)

    kw = dict(base_size=100, crop_size=64, augment=True, scale=True,
              flip=True, rotate=True, blur=True)
    ref_ds = _make_ref_dataset(ref_base, image, label, **kw)
    seg_ds = _make_seg_dataset(image, label, **kw)

    for seed in (0, 1, 7, 42):
        random.seed(seed)
        ref_img, ref_lbl = ref_ds._augmentation(image.copy(), label.copy())
        seg_img, seg_lbl = seg_ds._train_augmentation(
            image.copy(), label.copy(), random.Random(seed))
        np.testing.assert_allclose(np.asarray(seg_img, np.float32),
                                   np.asarray(ref_img, np.float32),
                                   atol=1e-4, err_msg=f"seed {seed}")
        np.testing.assert_array_equal(np.asarray(seg_lbl, np.int32),
                                      np.asarray(ref_lbl, np.int32))


def test_val_augmentation_matches_reference(ref):
    """Deterministic val path: cv2 resize + PIL NEAREST label resize + center
    crop (reference base/base_dataset.py:40-61)."""
    import base as ref_base

    rng = np.random.default_rng(3)
    image = np.asarray(rng.integers(0, 255, size=(70, 118, 3)), np.float32)
    label = rng.integers(0, 5, size=(70, 118)).astype(np.uint8)

    kw = dict(crop_size=64, augment=False, val=True)
    ref_ds = _make_ref_dataset(ref_base, image, label, **kw)
    seg_ds = _make_seg_dataset(image, label, **kw)

    ref_img, ref_lbl = ref_ds._val_augmentation(image.copy(), label.copy())
    seg_img, seg_lbl = seg_ds._val_augmentation(image.copy(), label.copy())
    np.testing.assert_allclose(np.asarray(seg_img, np.float32),
                               np.asarray(ref_img, np.float32), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(seg_lbl, np.int32),
                                  np.asarray(ref_lbl, np.int32))
