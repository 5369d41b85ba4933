#!/usr/bin/env python
"""Inference CLI — same surface as the reference (inference.py:158-173):

    python inference.py --config config.json --model <ckpt-dir> \
        --images <dir> [--mode multiscale|sliding] [--output outputs] \
        [--extension jpg]

Loads an orbax checkpoint directory produced by train.py (the reference's
.pth analog). Unlike the reference (inference.py:106-110, which rebuilds the
training loader and therefore needs the training DATASET on disk just to
read MEAN/STD), the config is read from the checkpoint's own meta.json and
the dataset stats come from the dataset's manifest without touching disk —
a checkpoint directory plus an image directory is enough. ``--config`` is a
fallback for checkpoints without embedded metadata.
"""

import argparse
import json
import os
from glob import glob

import numpy as np
from PIL import Image
from tqdm import tqdm


def resolve_config(args) -> dict:
    """Prefer the config snapshotted inside the checkpoint (meta.json,
    segtpu/checkpoint.py:30-32); fall back to --config."""
    from segtpu.checkpoint import load_config_from_checkpoint

    config = load_config_from_checkpoint(args.model)
    if config is not None:
        return config
    with open(args.config) as f:
        return json.load(f)


def dataset_meta(config):
    """(mean, std, palette, num_classes) WITHOUT the dataset on disk —
    shared with the serving exporter (segtpu/data/__init__.py)."""
    from segtpu.data import dataset_meta as _meta

    return _meta(config)


def run(args):
    config = resolve_config(args)

    import jax
    import jax.numpy as jnp

    from segtpu.checkpoint import load_model_weights
    from segtpu.inference_lib import (make_predictor, multi_scale_predict,
                                      sliding_predict)
    from segtpu.ops.reductions import fast_argmax
    from segtpu.models import MODELS
    from segtpu.utils.helpers import colorize_mask

    dataset_type = config["train_loader"]["type"]
    scales = ([0.75, 1.0, 1.25, 1.5, 1.75, 2.0, 2.25]
              if dataset_type == "CityScapes"
              else [0.75, 1.0, 1.25, 1.5, 1.75, 2.0])
    mean, std, palette, num_classes = dataset_meta(config)
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)

    model = MODELS[config["arch"]["type"]](
        num_classes=num_classes, **config["arch"]["args"])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        jnp.zeros((1, 64, 64, len(mean)), jnp.float32), train=False)
    params, batch_stats = load_model_weights(
        args.model, variables["params"], variables.get("batch_stats", {}))
    compute_dtype = (jnp.bfloat16
                     if getattr(args, "dtype", "float32") == "bfloat16"
                     else None)
    predict = make_predictor(model, params, batch_stats, bucket=args.bucket,
                             compute_dtype=compute_dtype)

    os.makedirs(args.output, exist_ok=True)
    image_files = sorted(glob(os.path.join(args.images, f"*.{args.extension}")))
    for img_file in tqdm(image_files, ncols=100):
        image = Image.open(img_file).convert("RGB")
        arr = (np.asarray(image, np.float32) / 255.0 - mean) / std

        # class_map=True: the CLI only needs the argmax map, so the argmax
        # runs on device and only (H, W) int32 crosses the host boundary
        # instead of the (H, W, C) float32 logits canvas.
        if args.mode == "multiscale":
            prediction = multi_scale_predict(predict, arr, scales,
                                             num_classes, class_map=True)
        elif args.mode == "sliding":
            prediction = sliding_predict(predict, arr, num_classes,
                                         class_map=True)
        else:
            prediction = np.asarray(
                fast_argmax(predict(arr[None])[0], axis=-1))
        prediction = prediction.astype(np.uint8)

        name = os.path.basename(img_file).split(".")[0]
        colorize_mask(prediction, palette).save(
            os.path.join(args.output, name + ".png"))


def main():
    run(parse_arguments())


def parse_arguments():
    parser = argparse.ArgumentParser(description="Inference")
    parser.add_argument("-c", "--config", default="config.json", type=str,
                        help="Fallback config if the checkpoint has no "
                             "embedded meta.json (the training config is "
                             "normally read from the checkpoint itself)")
    parser.add_argument("-mo", "--mode", default="multiscale", type=str,
                        help="Prediction mode: [multiscale, sliding, simple]")
    parser.add_argument("-m", "--model", default="best_model", type=str,
                        help="Path to the checkpoint directory")
    parser.add_argument("-i", "--images", default=None, type=str,
                        help="Path to the images to be segmented")
    parser.add_argument("-o", "--output", default="outputs", type=str,
                        help="Output Path")
    parser.add_argument("-e", "--extension", default="jpg", type=str,
                        help="The extension of the images to be segmented")
    parser.add_argument("-b", "--bucket", default=None, type=int,
                        help="Pad inputs to multiples of this (e.g. 128) to "
                             "bound XLA recompiles across image sizes")
    parser.add_argument("-d", "--dtype", default="float32", type=str,
                        choices=["float32", "bfloat16"],
                        help="Activation dtype for the forward (bfloat16 "
                             "doubles MXU throughput; logits/argmax computed "
                             "in float32 either way)")
    return parser.parse_args()


if __name__ == "__main__":
    main()
