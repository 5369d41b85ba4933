"""Weight conversion: build a synthetic torch-layout state_dict by INVERTING
the converter's transposes from our initialized param trees, convert it, and
require exact tree + value round-trip. Validates key mapping, completeness,
and layout transposes for every backbone family."""

import flax.traverse_util as tu
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segtpu.backbones.densenet import DenseNetFeatures
from segtpu.backbones.resnet import ResNetFeatures, RESNET_LAYERS
from segtpu.backbones.vgg import VGG16Features
from segtpu.backbones.xception import XceptionFeatures
from segtpu.utils import weight_convert as wc


def _init(module, hw=64):
    return module.init(jax.random.PRNGKey(0), jnp.zeros((1, hw, hw, 3)),
                       train=False)


def _tree_equal(a, b):
    fa, fb = tu.flatten_dict(a), tu.flatten_dict(b)
    assert set(fa) == set(fb), (
        f"missing: {set(fb) - set(fa)}; extra: {set(fa) - set(fb)}")
    for k in fa:
        np.testing.assert_array_equal(np.asarray(fa[k]), np.asarray(fb[k]),
                                      err_msg=str(k))


def _unconv(kernel):
    """Invert HWIO -> torch OIHW."""
    return np.transpose(np.asarray(kernel), (3, 2, 0, 1))


def _fake_bn_sd(sd, prefix, p, s):
    sd[f"{prefix}.weight"] = np.asarray(p["scale"])
    sd[f"{prefix}.bias"] = np.asarray(p["bias"])
    sd[f"{prefix}.running_mean"] = np.asarray(s["mean"])
    sd[f"{prefix}.running_var"] = np.asarray(s["var"])


@pytest.mark.parametrize("arch,style", [("resnet50", "torchvision"),
                                        ("resnet18", "torchvision"),
                                        ("resnet50", "encoding")])
def test_resnet_roundtrip(arch, style):
    mod = ResNetFeatures(arch=arch, style=style)
    variables = _init(mod)
    params, stats = variables["params"], variables["batch_stats"]
    block_kind, counts = RESNET_LAYERS[arch]
    deep_base = style == "encoding" and block_kind == "bottleneck"

    sd = {}
    if deep_base:
        sd["conv1.0.weight"] = _unconv(params["stem_conv1"]["kernel"])
        _fake_bn_sd(sd, "conv1.1", params["stem_bn1"], stats["stem_bn1"])
        sd["conv1.3.weight"] = _unconv(params["stem_conv2"]["kernel"])
        _fake_bn_sd(sd, "conv1.4", params["stem_bn2"], stats["stem_bn2"])
        sd["conv1.6.weight"] = _unconv(params["stem_conv3"]["kernel"])
    else:
        sd["conv1.weight"] = _unconv(params["stem_conv1"]["kernel"])
    _fake_bn_sd(sd, "bn1", params["stem_bn"], stats["stem_bn"])
    n_convs = 3 if block_kind == "bottleneck" else 2
    for li in range(4):
        for bi in range(counts[li]):
            o = f"layer{li + 1}_{bi}"
            t = f"layer{li + 1}.{bi}"
            for ci in range(1, n_convs + 1):
                sd[f"{t}.conv{ci}.weight"] = _unconv(params[o][f"conv{ci}"]["kernel"])
                _fake_bn_sd(sd, f"{t}.bn{ci}", params[o][f"bn{ci}"],
                            stats[o][f"bn{ci}"])
            if "downsample_conv" in params[o]:
                sd[f"{t}.downsample.0.weight"] = _unconv(
                    params[o]["downsample_conv"]["kernel"])
                _fake_bn_sd(sd, f"{t}.downsample.1",
                            params[o]["downsample_bn"], stats[o]["downsample_bn"])

    cp, cs = wc.convert_resnet(sd, arch=arch, style=style)
    _tree_equal(cp, params)
    _tree_equal(cs, stats)


@pytest.mark.parametrize("batch_norm", [False, True])
def test_vgg16_roundtrip(batch_norm):
    mod = VGG16Features(batch_norm=batch_norm)
    variables = _init(mod)
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    from segtpu.backbones.vgg import VGG16_STAGES

    sd = {}
    idx = 0
    for si, widths in enumerate(VGG16_STAGES):
        for ci, _ in enumerate(widths):
            sp = params[f"stage{si + 1}"]
            sd[f"features.{idx}.weight"] = _unconv(sp[f"conv{ci}"]["kernel"])
            sd[f"features.{idx}.bias"] = np.asarray(sp[f"conv{ci}"]["bias"])
            idx += 1
            if batch_norm:
                _fake_bn_sd(sd, f"features.{idx}", sp[f"bn{ci}"],
                            stats[f"stage{si + 1}"][f"bn{ci}"])
                idx += 1
            idx += 1
        idx += 1

    cp, cs = wc.convert_vgg16(sd, batch_norm=batch_norm)
    _tree_equal(cp, params)
    if batch_norm:
        _tree_equal(cs, stats)


def test_densenet_roundtrip():
    mod = DenseNetFeatures(arch="densenet121", pretrained_stem=True)
    variables = _init(mod)
    params, stats = variables["params"], variables["batch_stats"]

    from segtpu.backbones.densenet import DENSENET_CONFIG

    _, blocks, _ = DENSENET_CONFIG["densenet121"]
    sd = {}
    sd["features.conv0.weight"] = _unconv(params["stem_conv"]["kernel"])
    _fake_bn_sd(sd, "features.norm0", params["stem_bn"], stats["stem_bn"])
    for bi in range(4):
        for li in range(blocks[bi]):
            t = f"features.denseblock{bi + 1}.denselayer{li + 1}"
            lp = params[f"denseblock{bi + 1}"][f"denselayer{li + 1}"]
            ls = stats[f"denseblock{bi + 1}"][f"denselayer{li + 1}"]
            for norm, conv in (("norm1", "conv1"), ("norm2", "conv2")):
                _fake_bn_sd(sd, f"{t}.{norm}", lp[norm], ls[norm])
                sd[f"{t}.{conv}.weight"] = _unconv(lp[conv]["kernel"])
        if bi < 3:
            t = f"features.transition{bi + 1}"
            tp = params[f"transition{bi + 1}"]
            ts = stats[f"transition{bi + 1}"]
            _fake_bn_sd(sd, f"{t}.norm", tp["norm"], ts["norm"])
            sd[f"{t}.conv.weight"] = _unconv(tp["conv"]["kernel"])

    cp, cs = wc.convert_densenet(sd, arch="densenet121")
    _tree_equal(cp, params)
    _tree_equal(cs, stats)


def test_xception_roundtrip():
    mod = XceptionFeatures(output_stride=16)
    variables = _init(mod)
    params, stats = variables["params"], variables["batch_stats"]

    sd = {}
    sd["conv1.weight"] = _unconv(params["conv1"]["kernel"])
    _fake_bn_sd(sd, "bn1", params["bn1"], stats["bn1"])
    sd["conv2.weight"] = _unconv(params["conv2"]["kernel"])
    _fake_bn_sd(sd, "bn2", params["bn2"], stats["bn2"])

    def fake_sep(prefix, sp, ss):
        sd[f"{prefix}.conv1.weight"] = _unconv(sp["depthwise"]["kernel"])
        sd[f"{prefix}.pointwise.weight"] = _unconv(sp["pointwise"]["kernel"])
        _fake_bn_sd(sd, f"{prefix}.bn", sp["bn"], ss["bn"])

    for b in range(1, 21):
        o = f"block{b}"
        sep_idx = (0, 3, 6) if b == 1 else (1, 4, 7)
        for si, ri in enumerate(sep_idx):
            fake_sep(f"{o}.rep.{ri}", params[o][f"sep{si + 1}"],
                     stats[o][f"sep{si + 1}"])
            _fake_bn_sd(sd, f"{o}.rep.{ri + 1}", params[o][f"bn{si + 1}"],
                        stats[o][f"bn{si + 1}"])
        if "skip_conv" in params[o]:
            sd[f"{o}.skip.weight"] = _unconv(params[o]["skip_conv"]["kernel"])
            _fake_bn_sd(sd, f"{o}.skipbn", params[o]["skip_bn"],
                        stats[o]["skip_bn"])
    for i in (3, 4, 5):
        fake_sep(f"conv{i}", params[f"conv{i}"], stats[f"conv{i}"])
        _fake_bn_sd(sd, f"bn{i}", params[f"bn{i}"], stats[f"bn{i}"])

    cp, cs = wc.convert_xception(sd)
    _tree_equal(cp, params)
    _tree_equal(cs, stats)


def test_fcn_classifier_conversion_shapes():
    sd = {"classifier.0.weight": np.zeros((4096, 512 * 7 * 7), np.float32),
          "classifier.0.bias": np.zeros((4096,), np.float32),
          "classifier.3.weight": np.zeros((4096, 4096), np.float32),
          "classifier.3.bias": np.zeros((4096,), np.float32)}
    out = wc.convert_vgg16_classifier(sd)
    assert out["backbone_conv6"]["kernel"].shape == (7, 7, 512, 4096)
    assert out["backbone_conv7"]["kernel"].shape == (1, 1, 4096, 4096)


def test_load_pretrained_backbone_roundtrip(tmp_path):
    """convert -> save -> load into a PSPNet state."""
    import orbax.checkpoint as ocp

    from segtpu.core import create_train_state, make_optimizer
    from segtpu.models import get_model
    from segtpu.pretrained import apply_pretrained

    model = get_model("PSPNet", num_classes=5, backbone="resnet18",
                      use_aux=False)
    tx = make_optimizer(lr=0.01, num_epochs=1, iters_per_epoch=1)
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3)))

    # fabricate a "pretrained" backbone: the model's own backbone scaled 2x
    bb_p = jax.tree_util.tree_map(lambda a: np.asarray(a) * 2.0,
                                  state.params["backbone"])
    bb_s = jax.tree_util.tree_map(np.asarray, state.batch_stats["backbone"])
    path = str(tmp_path / "bb")
    ck = ocp.StandardCheckpointer()
    ck.save(path, {"params": bb_p, "batch_stats": bb_s}, force=True)
    ck.wait_until_finished()

    new_state = apply_pretrained(state, model, path)
    a = tu.flatten_dict(jax.tree_util.tree_map(np.asarray,
                                               new_state.params["backbone"]))
    b = tu.flatten_dict(bb_p)
    for k in b:
        np.testing.assert_array_equal(a[k], b[k])
    # decoder untouched
    np.testing.assert_array_equal(
        np.asarray(new_state.params["classifier"]["kernel"]),
        np.asarray(state.params["classifier"]["kernel"]))
