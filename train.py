#!/usr/bin/env python
"""Training CLI — same surface as the reference:

    python train.py --config config.json [--resume <ckpt-dir>] [--device N]

(reference train.py:44-61). The config schema is the reference's
(config.json keys: name, arch, train_loader, val_loader, optimizer, loss,
ignore_index, lr_scheduler, trainer). ``n_gpu``/``use_synch_bn`` are accepted
and ignored: the device mesh uses every visible TPU chip and BatchNorm is
always cross-replica synced under jit (segtpu/nn/layers.py).
"""

import argparse
import json
import logging


def get_instance(module_registry, name, config, *args, **extra):
    """Registry-based instantiation (reference train.py:14-16)."""
    cfg = config[name]
    if cfg["type"] not in module_registry:
        raise KeyError(
            f"unknown {name} type {cfg['type']!r}; available: "
            f"{sorted(module_registry)}")
    return module_registry[cfg["type"]](*args, **{**cfg["args"], **extra})


def main(config, resume):
    from segtpu import models as model_zoo
    from segtpu.data import DATASETS
    from segtpu.trainer import Trainer
    from segtpu.utils import Logger

    train_logger = Logger()

    # DATA LOADERS
    train_loader = get_instance(DATASETS, "train_loader", config)
    val_loader = None
    if "val_loader" in config:
        val_loader = get_instance(DATASETS, "val_loader", config)
    elif getattr(train_loader, "val_split", 0):
        val_loader = train_loader.get_val_loader()

    # MODEL
    model = get_instance(model_zoo.MODELS, "arch", config,
                         num_classes=train_loader.dataset.num_classes)
    logging.getLogger("segtpu.train").info(f"model: {type(model).__name__}")

    trainer = Trainer(
        model=model,
        loss=config["loss"],
        config=config,
        resume=resume,
        train_loader=train_loader,
        val_loader=val_loader,
        train_logger=train_logger,
    )
    trainer.train()
    return trainer


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="segtpu training")
    parser.add_argument("-c", "--config", default="config.json", type=str,
                        help="Path to the config file (default: config.json)")
    parser.add_argument("-r", "--resume", default=None, type=str,
                        help="Path to the checkpoint directory to resume from")
    parser.add_argument("-d", "--device", default=None, type=str,
                        help="visible device ids (maps to JAX visible devices)")
    args = parser.parse_args()

    if args.resume:
        from segtpu.checkpoint import load_config_from_checkpoint

        config = load_config_from_checkpoint(args.resume)
        if config is None:
            with open(args.config) as f:
                config = json.load(f)
    else:
        with open(args.config) as f:
            config = json.load(f)
    if args.device:
        # The reference restricts torch to these ids via CUDA_VISIBLE_DEVICES
        # (reference train.py:58-59); here the ids select the jax.devices()
        # subset the Trainer builds its mesh over (trainer.device_ids).
        config.setdefault("trainer", {})["device_ids"] = args.device

    main(config, args.resume)
