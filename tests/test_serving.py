"""AOT serving export: checkpoint -> StableHLO artifact -> rehydrate -> run.

The deserialized artifact must reproduce the live model's predictions; it
must be callable with only jax (no segtpu model classes involved in the
call path)."""

import json
import os
import types

import jax
import jax.numpy as jnp
import numpy as np

from segtpu.checkpoint import save_checkpoint
from segtpu.models import get_model
from segtpu.serving import (build_serve_fn, export_checkpoint,
                            load_serving_artifact)

CFG = {
    "name": "ServeTest",
    "arch": {"type": "UNet", "args": {}},
    "train_loader": {"type": "Synthetic",
                     "args": {"batch_size": 2, "size": 4, "num_classes": 5,
                              "image_hw": 48, "crop_size": 40}},
    "trainer": {"epochs": 1, "save_dir": "x", "log_dir": "x"},
}


def _fake_checkpoint(tmp_path):
    model = get_model("UNet", num_classes=5)
    variables = model.init(
        {"params": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(0)},
        jnp.zeros((1, 40, 40, 3), jnp.float32), train=False)
    state = types.SimpleNamespace(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state={}, step=jnp.zeros((), jnp.int32))
    save_checkpoint(str(tmp_path), "ckpt", state, epoch=1,
                    monitor_best=0.0, config=CFG, arch="UNet")
    return model, variables, os.path.join(str(tmp_path), "ckpt")


def test_export_and_rehydrate(tmp_path):
    model, variables, ckpt = _fake_checkpoint(tmp_path)
    out = export_checkpoint(ckpt, str(tmp_path / "artifact"),
                            batch=2, hw=(40, 40), platforms=["cpu"])

    meta = json.load(open(os.path.join(out, "serving.json")))
    assert meta["num_classes"] == 5
    assert meta["input"] == {"shape": [2, 40, 40, 3], "dtype": "uint8",
                             "layout": "NHWC"}

    call, _ = load_serving_artifact(out)
    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, size=(2, 40, 40, 3)).astype(np.uint8)
    preds, conf = call(x)

    from segtpu.data import dataset_meta

    mean, std, _, _ = dataset_meta(CFG)
    direct = build_serve_fn(model, variables["params"],
                            variables.get("batch_stats", {}), mean, std)
    want_preds, want_conf = direct(jnp.asarray(x))
    # The exported program's fusion order differs from the live jit, so
    # bf16 rounding can flip argmax where an UNTRAINED model's classes are
    # near-ties; require ≥99.5% agreement and matching confidences.
    agree = np.mean(np.asarray(preds) == np.asarray(want_preds))
    assert agree >= 0.995, f"pred agreement {agree:.4f}"
    np.testing.assert_allclose(np.asarray(conf), np.asarray(want_conf),
                               atol=0.05)
    assert preds.dtype == jnp.int32 and 0 <= int(np.min(preds))
    assert int(np.max(preds)) < 5
