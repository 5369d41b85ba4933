"""Model zoo: init/forward shape tests, jit-compilability, aux-head contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segtpu.models import MODELS, get_model

NUM_CLASSES = 7

# (name, kwargs, input hw) — small configs so the suite stays fast.
CASES = [
    ("UNet", {}, 64),
    ("UNetResnet", {"backbone": "resnet50"}, 64),
    ("SegNet", {}, 64),
    ("SegResNet", {}, 64),
    ("ENet", {}, 64),
    ("GCN", {"backbone": "resnet50"}, 64),
    ("GCN", {"backbone": "resnet50", "use_resnet_gcn": True, "use_deconv": True}, 64),
    ("DeepLab", {"backbone": "resnet50", "output_stride": 16}, 64),
    ("DeepLab", {"backbone": "xception", "output_stride": 16}, 64),
    ("DeepLab_DUC_HDC", {"backbone": "resnet50"}, 64),
    ("UperNet", {"backbone": "resnet50"}, 64),
    ("PSPNet", {"backbone": "resnet50"}, 64),
    ("PSPDenseNet", {"backbone": "densenet121"}, 64),
    ("FCN8", {}, 64),
]


@pytest.mark.parametrize("name,kwargs,hw", CASES,
                         ids=[f"{c[0]}-{i}" for i, c in enumerate(CASES)])
def test_model_forward_shapes(name, kwargs, hw):
    model = get_model(name, num_classes=NUM_CLASSES, **kwargs)
    x = jnp.zeros((1, hw, hw, 3), jnp.float32)
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key}, x, train=False)
    out = model.apply(variables, x, train=False)
    assert set(out) == {"out"}
    assert out["out"].shape == (1, hw, hw, NUM_CLASSES), out["out"].shape
    assert np.isfinite(np.asarray(out["out"])).all()


def test_pspnet_aux_head_train_only():
    model = get_model("PSPNet", num_classes=NUM_CLASSES, backbone="resnet50")
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key}, x, train=False)
    out, _ = model.apply(variables, x, train=True,
                         rngs={"dropout": key}, mutable=["batch_stats"])
    assert set(out) == {"out", "aux"}
    assert out["aux"].shape == (1, 64, 64, NUM_CLASSES)
    out_eval = model.apply(variables, x, train=False)
    assert set(out_eval) == {"out"}


def test_backbone_scope_present_for_differential_lr():
    model = get_model("PSPNet", num_classes=NUM_CLASSES, backbone="resnet50")
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(0)}, x, train=False)
    assert "backbone" in variables["params"]
    non_backbone = [k for k in variables["params"] if k != "backbone"]
    assert non_backbone, "decoder params must live outside the backbone scope"


def test_unet_jit_and_grad():
    model = get_model("UNet", num_classes=NUM_CLASSES)
    x = jnp.ones((2, 64, 64, 3), jnp.float32)
    labels = jnp.zeros((2, 64, 64), jnp.int32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)

    @jax.jit
    def loss_fn(params, batch_stats, x, y):
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=True,
            mutable=["batch_stats"])
        logits = out["out"].astype(jnp.float32)
        logp = jax.nn.log_softmax(logits)
        loss = -jnp.mean(jnp.take_along_axis(logp, y[..., None], axis=-1))
        return loss

    g = jax.grad(loss_fn)(variables["params"], variables["batch_stats"], x, labels)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.abs(np.asarray(l)).sum() > 0 for l in leaves)


@pytest.mark.parametrize("name,kwargs", [
    ("FCN8", {}),                      # fixed bilinear upsamplers + crops
    ("ENet", {}),                      # max-unpool identities, PReLU
    ("SegNet", {}),                    # unpooling decoder
    ("SegResNet", {}),                 # stem-unpool + transpose-conv decoder
    ("GCN", {"backbone": "resnet50", "use_deconv": True}),
    ("DeepLab_DUC_HDC", {"backbone": "resnet50"}),  # pixel-shuffle heads
])
def test_model_backward_pass(name, kwargs):
    """Every exotic decoder op must be differentiable end to end."""
    model = get_model(name, num_classes=NUM_CLASSES, **kwargs)
    x = jnp.ones((1, 64, 64, 3), jnp.float32) * 0.1
    y = jnp.zeros((1, 64, 64), jnp.int32)
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key}, x, train=False)

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, **{k: v for k, v in variables.items()
                                  if k != "params"}},
            x, train=True, rngs={"dropout": key},
            mutable=[k for k in variables if k != "params"])
        logits = out["out"].astype(jnp.float32)
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(logp, y[..., None], axis=-1))

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    total = sum(float(np.abs(np.asarray(l)).sum()) for l in leaves)
    assert total > 0


def test_in_channels_4():
    """Non-RGB inputs (the reference swaps its first conv,
    e.g. models/unet.py:132-134); stems here infer width from the input."""
    for name in ("UNet", "PSPNet"):
        kwargs = {"backbone": "resnet18"} if name == "PSPNet" else {}
        model = get_model(name, num_classes=4, in_channels=4, **kwargs)
        x = jnp.zeros((1, 64, 64, 4), jnp.float32)
        key = jax.random.PRNGKey(0)
        variables = model.init({"params": key, "dropout": key}, x, train=False)
        out = model.apply(variables, x, train=False)
        assert out["out"].shape == (1, 64, 64, 4)


@pytest.mark.parametrize("name,kwargs", [
    ("ENet", {}),
    ("GCN", {"backbone": "resnet18", "use_deconv": True}),
    ("SegResNet", {}),
    ("UperNet", {"backbone": "resnet18"}),
    ("DeepLab_DUC_HDC", {"backbone": "resnet18"}),
])
def test_odd_input_sizes(name, kwargs):
    """Odd crops (e.g. Cityscapes 769) must work: torch F.pad crops on
    negative pads, jnp.pad does not — regression for the pad_or_crop paths."""
    model = get_model(name, num_classes=NUM_CLASSES, **kwargs)
    hw = 97
    x = jnp.zeros((1, hw, hw, 3), jnp.float32)
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key}, x, train=False)
    out = model.apply(variables, x, train=False)
    assert out["out"].shape == (1, hw, hw, NUM_CLASSES)


def test_remat_backbone_identical_forward():
    x = jnp.ones((1, 64, 64, 3), jnp.float32) * 0.2
    key = jax.random.PRNGKey(0)
    a = get_model("PSPNet", num_classes=NUM_CLASSES, backbone="resnet18",
                  use_aux=False, remat_backbone=False)
    b = get_model("PSPNet", num_classes=NUM_CLASSES, backbone="resnet18",
                  use_aux=False, remat_backbone=True)
    va = a.init({"params": key, "dropout": key}, x, train=False)
    ya = a.apply(va, x, train=False)["out"]
    yb = b.apply(va, x, train=False)["out"]  # same params: remat is math-free
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb),
                               rtol=1e-6, atol=1e-6)
