"""Pretrained-backbone wiring (segtpu/pretrained.py): resolution rules,
loud failures, merge correctness, and the Trainer integration — the
reference's in-constructor pretrained loads (reference models/resnet.py:292-306)
re-expressed as offline-convert + online-merge."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp
import pytest

from segtpu import pretrained as P
from segtpu.core import create_train_state, make_optimizer
from segtpu.models import get_model


def _init_state(model, hw=64):
    tx = make_optimizer(lr=0.01, num_epochs=1, iters_per_epoch=2)
    return create_train_state(model, tx, jax.random.PRNGKey(0),
                              jnp.zeros((1, hw, hw, 3), jnp.float32))


def _shifted(tree, delta=0.125):
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x, np.float32) + delta, tree)


def _save(path, params, stats, extras=None):
    tree = {"params": params, "batch_stats": stats}
    if extras is not None:
        tree["extras"] = extras
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(str(path), tree, force=True)
    ckptr.wait_until_finished()


@pytest.fixture(scope="module")
def psp_state():
    model = get_model("PSPNet", num_classes=6, backbone="resnet18",
                      use_aux=False, pretrained=True)
    return model, _init_state(model)


def _assert_trees_equal(a, b):
    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_merge_replaces_backbone_and_keeps_head(tmp_path, psp_state):
    model, state = psp_state
    fixture_p = _shifted(state.params["backbone"])
    fixture_s = _shifted(state.batch_stats["backbone"])
    _save(tmp_path / "resnet18s", fixture_p, fixture_s)

    new = P.maybe_load_pretrained(state, model,
                                  {"pretrained_dir": str(tmp_path)})
    _assert_trees_equal(new.params["backbone"], fixture_p)
    _assert_trees_equal(new.batch_stats["backbone"], fixture_s)
    # non-backbone scopes untouched
    for k in state.params:
        if k != "backbone":
            _assert_trees_equal(new.params[k], state.params[k])


def test_direct_path_and_falsy_noop(tmp_path, psp_state):
    model, state = psp_state
    fixture_p = _shifted(state.params["backbone"], 0.25)
    fixture_s = _shifted(state.batch_stats["backbone"], 0.25)
    _save(tmp_path / "anywhere", fixture_p, fixture_s)

    model2 = get_model("PSPNet", num_classes=6, backbone="resnet18",
                       use_aux=False, pretrained=str(tmp_path / "anywhere"))
    new = P.maybe_load_pretrained(state, model2, {})
    _assert_trees_equal(new.params["backbone"], fixture_p)

    model3 = get_model("PSPNet", num_classes=6, backbone="resnet18",
                       use_aux=False, pretrained=False)
    assert P.maybe_load_pretrained(state, model3, {}) is state


def test_missing_weights_fail_loudly(tmp_path, psp_state):
    model, state = psp_state
    # no pretrained_dir configured anywhere
    with pytest.raises(RuntimeError, match="pretrained_dir"):
        P.maybe_load_pretrained(state, model, {})
    # configured root exists but has no converted checkpoint
    with pytest.raises(FileNotFoundError, match="convert_weights"):
        P.maybe_load_pretrained(state, model,
                                {"pretrained_dir": str(tmp_path)})
    # direct path that doesn't exist
    model2 = get_model("PSPNet", num_classes=6, backbone="resnet18",
                       use_aux=False, pretrained=str(tmp_path / "nope"))
    with pytest.raises(FileNotFoundError):
        P.maybe_load_pretrained(state, model2, {})


def test_shape_mismatch_fails(tmp_path, psp_state):
    model, state = psp_state
    bad = _shifted(state.params["backbone"])
    bad["stem_conv1"]["kernel"] = np.zeros((3, 3, 3, 8), np.float32)
    _save(tmp_path / "resnet18s", bad, _shifted(state.batch_stats["backbone"]))
    with pytest.raises(ValueError, match="shape mismatch"):
        P.maybe_load_pretrained(state, model,
                                {"pretrained_dir": str(tmp_path)})


def test_checkpoint_ids():
    ids = [
        ("PSPNet", {"backbone": "resnet50", "use_aux": False}, "resnet50s"),
        ("UNetResnet", {"backbone": "resnet50"}, "resnet50s"),
        ("UperNet", {"backbone": "resnet101"}, "resnet101"),
        ("SegResNet", {}, "resnet50"),
        ("SegNet", {}, "vgg16_bn"),
        ("FCN8", {}, "vgg16"),
        ("PSPDenseNet", {"backbone": "densenet201", "use_aux": False},
         "densenet201"),
    ]
    for name, kw, want in ids:
        model = get_model(name, num_classes=6, **kw)
        assert P.checkpoint_id(model) == want, name


# ---------------------------------------------------------------------------
# Cheap structural tests via a fake state (no giant model init needed)

@dataclasses.dataclass
class _FakeState:
    params: dict
    batch_stats: dict

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


def test_fcn8_requires_classifier_extras(tmp_path):
    fake_model = type("FCN8", (), {"pretrained": True})()
    params = {"backbone": {"stage1": {"conv0": {
        "kernel": np.zeros((3, 3, 3, 4), np.float32)}}},
        "backbone_conv6": {"kernel": np.zeros((7, 7, 4, 8), np.float32)}}
    state = _FakeState(params, {"backbone": {}})
    _save(tmp_path / "vgg16",
          {"stage1": {"conv0": {"kernel": np.ones((3, 3, 3, 4), np.float32)}}},
          {})
    with pytest.raises(ValueError, match="extras"):
        P.apply_pretrained(state, fake_model, str(tmp_path / "vgg16"))

    # with extras present it merges both the backbone and the classifier
    _save(tmp_path / "vgg16_full",
          {"stage1": {"conv0": {"kernel": np.ones((3, 3, 3, 4), np.float32)}}},
          {},
          extras={"backbone_conv6": {
              "kernel": np.full((7, 7, 4, 8), 2.0, np.float32)}})
    new = P.apply_pretrained(state, fake_model, str(tmp_path / "vgg16_full"))
    np.testing.assert_array_equal(
        np.asarray(new.params["backbone_conv6"]["kernel"]),
        np.full((7, 7, 4, 8), 2.0, np.float32))


def test_segresnet_remap(tmp_path):
    fake_model = type("SegResNet", (), {"pretrained": True})()
    conv = lambda v: {"kernel": np.full((1, 1, 2, 2), v, np.float32)}
    bn = lambda v: {"scale": np.full((2,), v, np.float32),
                    "bias": np.zeros((2,), np.float32)}
    params = {
        "backbone_stem_conv": conv(0.0),
        "backbone_stem_bn": bn(0.0),
        "backbone_layer1_0": {"conv1": conv(0.0), "bn1": bn(0.0)},
        "decoder1_0": {"conv1": conv(0.0)},
    }
    state = _FakeState(params, {})
    ck_params = {"stem_conv1": conv(1.0), "stem_bn": bn(1.0),
                 "layer1_0": {"conv1": conv(1.0), "bn1": bn(1.0)}}
    _save(tmp_path / "resnet50", ck_params, {})
    new = P.apply_pretrained(state, fake_model, str(tmp_path / "resnet50"))
    np.testing.assert_array_equal(
        np.asarray(new.params["backbone_stem_conv"]["kernel"]),
        np.full((1, 1, 2, 2), 1.0, np.float32))
    np.testing.assert_array_equal(
        np.asarray(new.params["backbone_layer1_0"]["bn1"]["scale"]),
        np.full((2,), 1.0, np.float32))
    # decoder untouched
    np.testing.assert_array_equal(
        np.asarray(new.params["decoder1_0"]["conv1"]["kernel"]),
        np.zeros((1, 1, 2, 2), np.float32))


def test_resnetgcn_partial_merge(tmp_path, psp_state):
    """ResnetGCN keeps only stem+layer1/2 of a pretrained resnet (reference
    models/gcn.py:83-90): checkpoint layer3/4 keys must be skipped."""
    model = get_model("GCN", num_classes=6, backbone="resnet18",
                      use_resnet_gcn=True, pretrained=True)
    state = _init_state(model)
    # full resnet18 checkpoint: reuse the PSPNet fixture's backbone tree
    _, psp = psp_state
    _save(tmp_path / "resnet18",
          _shifted(psp.params["backbone"]),
          _shifted(psp.batch_stats["backbone"]))
    new = P.maybe_load_pretrained(state, model,
                                  {"pretrained_dir": str(tmp_path)})
    # stem + layer1/2 replaced
    np.testing.assert_array_equal(
        np.asarray(new.params["backbone"]["stem_conv1"]["kernel"]),
        np.asarray(psp.params["backbone"]["stem_conv1"]["kernel"]) + 0.125)
    # GCN layers untouched
    _assert_trees_equal(new.params["backbone"]["layer3_0"],
                        state.params["backbone"]["layer3_0"])


def test_trainer_wires_pretrained(tmp_path, psp_state):
    """Full Trainer path: arch.args.pretrained=true + pretrained_dir config key
    loads the converted weights into the train state."""
    from segtpu.data import Synthetic
    from segtpu.trainer import Trainer

    _, psp = psp_state
    fixture_p = _shifted(psp.params["backbone"], 0.5)
    fixture_s = _shifted(psp.batch_stats["backbone"], 0.5)
    _save(tmp_path / "resnet18s", fixture_p, fixture_s)

    config = {
        "name": "PreTest",
        "arch": {"type": "PSPNet", "args": {"backbone": "resnet18",
                                            "use_aux": False,
                                            "pretrained": True}},
        "pretrained_dir": str(tmp_path),
        "loss": "CrossEntropyLoss2d",
        "ignore_index": 255,
        "optimizer": {"type": "SGD", "args": {"lr": 0.01}},
        "lr_scheduler": {"type": "Poly", "args": {}},
        "trainer": {"epochs": 1, "save_dir": str(tmp_path / "saved"),
                    "save_period": 10, "monitor": "off", "tensorboard": False,
                    "val": False, "progress_bar": False},
    }
    train_loader = Synthetic(batch_size=2, size=2, num_classes=6, image_hw=72,
                             crop_size=64, shuffle=False)
    model = get_model("PSPNet", num_classes=6, backbone="resnet18",
                      use_aux=False, pretrained=True)
    trainer = Trainer(model=model, loss="CrossEntropyLoss2d", config=config,
                      train_loader=train_loader, compute_dtype=jnp.float32)
    _assert_trees_equal(trainer.state.params["backbone"], fixture_p)

    # and the loud-failure path surfaces through the Trainer too
    config2 = dict(config)
    del config2["pretrained_dir"]
    with pytest.raises(RuntimeError, match="pretrained_dir"):
        Trainer(model=model, loss="CrossEntropyLoss2d", config=config2,
                train_loader=train_loader, compute_dtype=jnp.float32)
