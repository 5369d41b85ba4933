#!/usr/bin/env python
"""Headline benchmark: PSPNet-ResNet50 Cityscapes-crop (769x769) training
throughput, imgs/sec/chip.

Baseline for ``vs_baseline``: the reference publishes NO speed numbers
(SURVEY.md §6), so the baseline is a V100 estimate for the same model/crop
under torch 1.1 DataParallel fp32: ~7 imgs/sec/chip (PSPNet-R50 stride-8 at
769^2 is ~0.75 TFLOPs/img trained; V100 fp32 at ~35% efficiency sustains
~5.5 TFLOPs). The BASELINE.json north star is >=2x that on a v5e chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

V100_BASELINE_IMGS_PER_SEC = 7.0
CROP = 769
NUM_CLASSES = 19


def run_bench():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from segtpu.core import (create_train_state, make_mesh, make_optimizer,
                             make_train_step, shard_batch)
    from segtpu.losses import cross_entropy
    from segtpu.models import get_model

    n_chips = len(jax.devices())
    mesh = make_mesh()
    model = get_model("PSPNet", num_classes=NUM_CLASSES, backbone="resnet50",
                      use_aux=True)
    tx = make_optimizer(lr=0.01, num_epochs=100, iters_per_epoch=1000)

    rng = np.random.default_rng(0)
    last_err = None
    for batch in (8 * n_chips, 4 * n_chips, 2 * n_chips, n_chips):
        try:
            state = create_train_state(
                model, tx, jax.random.PRNGKey(0),
                jnp.zeros((1, CROP, CROP, 3), jnp.float32))
            step = make_train_step(model, cross_entropy, NUM_CLASSES,
                                   mesh=mesh)
            images = rng.normal(size=(batch, CROP, CROP, 3)).astype(np.float32)
            labels = rng.integers(0, NUM_CLASSES,
                                  size=(batch, CROP, CROP)).astype(np.int32)
            images_d, labels_d = shard_batch(mesh, (images, labels))
            key = jax.random.PRNGKey(1)

            # XLA-counted FLOPs of the whole train step, for MFU. NOTE:
            # this costs a second XLA compilation (the AOT executable isn't
            # reused by the later step(...) calls), but the pre-compile
            # Lowered.cost_analysis() HANGS over the axon tunnel (observed
            # 2026-08-17) — the compiled path is the one that works there.
            flops_per_step = 0.0
            try:
                ca = step.lower(state, images_d, labels_d,
                                key).compile().cost_analysis()
                ca = ca[0] if isinstance(ca, list) else ca
                flops_per_step = float(ca.get("flops", 0.0))
            except Exception:
                pass

            # warmup / compile. NOTE: synchronization is a scalar D2H
            # transfer (float(loss)) — on the experimental remote-TPU
            # platform block_until_ready has been observed to return before
            # the dispatch queue drains, which silently inflates throughput.
            for _ in range(3):
                state, loss, _ = step(state, images_d, labels_d, key)
            float(loss)

            n_steps = 10
            t0 = time.perf_counter()
            for _ in range(n_steps):
                state, loss, _ = step(state, images_d, labels_d, key)
            float(loss)
            dt = time.perf_counter() - t0
            if dt < n_steps * 1e-3:
                raise RuntimeError(f"bogus timing: {dt:.4f}s for {n_steps} steps")

            imgs_per_sec_per_chip = (batch * n_steps) / dt / n_chips
            # MFU against v5e bf16 peak (197 TFLOP/s/chip)
            tflops = flops_per_step / (dt / n_steps) / 1e12 / n_chips
            mfu = tflops / 197.0 if flops_per_step else 0.0
            return imgs_per_sec_per_chip, batch, flops_per_step, mfu
        except Exception as e:  # OOM at this batch size -> try smaller
            last_err = e
            continue
    raise RuntimeError(f"all batch sizes failed: {last_err}")


def main():
    try:
        value, batch, flops, mfu = run_bench()
        print(json.dumps({
            "metric": f"pspnet_r50_cityscapes_{CROP}px_train_throughput",
            "value": round(value, 3),
            "unit": "imgs/sec/chip",
            "vs_baseline": round(value / V100_BASELINE_IMGS_PER_SEC, 3),
            "batch": batch,
            "tflops_per_step": round(flops / 1e12, 2),
            "mfu": round(mfu, 3),
        }))
    except Exception as e:
        print(json.dumps({
            "metric": f"pspnet_r50_cityscapes_{CROP}px_train_throughput",
            "value": 0.0,
            "unit": "imgs/sec/chip",
            "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}"[:300],
        }))
        sys.exit(0)


if __name__ == "__main__":
    main()
