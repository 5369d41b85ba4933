"""AOT model export for TPU serving (jax.export / StableHLO).

Beyond the reference (whose deployment story is "run inference.py with the
training repo importable"): a trained segtpu checkpoint exports to a
self-contained serialized artifact that rehydrates in ANY JAX process with
``jax.export.deserialize`` — no segtpu, no flax, no model code, no Python
class definitions needed at serving time — plus a sidecar ``serving.json``
carrying the palette/classes/normalization so a thin server can postprocess.

The exported function is the full serving computation: uint8 RGB batch in,
(int32 predictions, float32 max-probability map) out — ToTensor+Normalize,
the bf16 forward, argmax, and confidence all fused into one XLA program, so
the serving host ships 1/4 the input bytes (uint8) and receives compact
outputs (no full logit volumes over PCIe).

Exports are lowered for both CPU and TPU by default, so the same artifact
serves on either (and unit tests exercise the real artifact on CPU).
"""

from __future__ import annotations

import json
import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from segtpu.ops.reductions import fast_argmax
import numpy as np


def build_serve_fn(model, params, batch_stats, mean, std,
                   compute_dtype=jnp.bfloat16):
    """uint8 NHWC batch -> (predictions int32 NHW, confidence float32 NHW)."""
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)

    def serve(images_u8):
        x = images_u8.astype(jnp.float32) / 255.0
        x = (x - mean) / std
        logits = model.apply({"params": params, "batch_stats": batch_stats},
                             x.astype(compute_dtype), train=False)["out"]
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        preds = fast_argmax(probs, axis=-1).astype(jnp.int32)
        conf = jnp.max(probs, axis=-1)
        return preds, conf

    return serve


def export_checkpoint(checkpoint_dir: str, output_dir: str,
                      batch: int = 1, hw: Tuple[int, int] = (513, 513),
                      platforms: Sequence[str] = ("cpu", "tpu")) -> str:
    """Export a training checkpoint as a serving artifact.

    Writes ``<output_dir>/model.stablehlo`` (jax.export serialization; model
    weights embedded as constants) and ``<output_dir>/serving.json``
    (input signature, num_classes, palette, mean/std). Returns output_dir.
    """
    from segtpu.checkpoint import load_config_from_checkpoint, \
        load_model_weights
    from segtpu.data import dataset_meta
    from segtpu.models import MODELS

    config = load_config_from_checkpoint(checkpoint_dir)
    if config is None:
        raise FileNotFoundError(
            f"{checkpoint_dir}: no meta.json — not a segtpu checkpoint")
    mean, std, palette, num_classes = dataset_meta(config)
    model = MODELS[config["arch"]["type"]](
        num_classes=num_classes, **config["arch"]["args"])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        jnp.zeros((1, 64, 64, len(mean)), jnp.float32), train=False)
    params, batch_stats = load_model_weights(
        checkpoint_dir, variables["params"], variables.get("batch_stats", {}))

    serve = build_serve_fn(model, params, batch_stats, mean, std)
    spec = jax.ShapeDtypeStruct((batch, hw[0], hw[1], len(mean)), jnp.uint8)
    exported = jax.export.export(jax.jit(serve),
                                 platforms=list(platforms))(spec)
    blob = exported.serialize()

    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, "model.stablehlo"), "wb") as f:
        f.write(blob)
    with open(os.path.join(output_dir, "serving.json"), "w") as f:
        json.dump({
            "input": {"shape": [batch, hw[0], hw[1], len(mean)],
                      "dtype": "uint8", "layout": "NHWC"},
            "outputs": ["predictions int32 NHW", "confidence float32 NHW"],
            "num_classes": int(num_classes),
            "palette": [int(v) for v in palette],
            "mean": [float(m) for m in mean],
            "std": [float(s) for s in std],
            "arch": config["arch"],
            "platforms": list(platforms),
        }, f, indent=2)
    return output_dir


def load_serving_artifact(artifact_dir: str):
    """Rehydrate an exported artifact: returns (callable, meta dict).

    The callable takes a uint8 NHWC batch matching serving.json's input
    signature and returns (predictions, confidence). Needs only jax —
    no segtpu model code.
    """
    with open(os.path.join(artifact_dir, "model.stablehlo"), "rb") as f:
        exported = jax.export.deserialize(bytearray(f.read()))
    with open(os.path.join(artifact_dir, "serving.json")) as f:
        meta = json.load(f)

    def call(images_u8):
        return exported.call(jnp.asarray(images_u8, jnp.uint8))

    return call, meta
