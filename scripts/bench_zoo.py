"""Measured-throughput sweep for the README table (real TPU).

One line per case: train (or eval) imgs/sec/chip at 769x769 bf16, timed by
forcing the loss scalar to host (see CLAUDE.md: block_until_ready is
unreliable over the tunnel).
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax, jax.numpy as jnp

from segtpu.core import (create_train_state, make_mesh, make_optimizer,
                         make_train_step, make_eval_step, shard_batch)
from segtpu.losses import cross_entropy
from segtpu.models import get_model

CROP = 769
CASES = [
    ("PSPNet-R50 (+aux) train", "PSPNet",
     {"backbone": "resnet50", "use_aux": True}, 8, True),
    ("PSPNet-R101 (+aux) train", "PSPNet",
     {"backbone": "resnet101", "use_aux": True}, 8, True),
    ("DeepLabV3+ Xception train", "DeepLab",
     {"backbone": "xception", "output_stride": 16}, 8, True),
    ("ENet train", "ENet", {}, 16, True),
    ("PSPNet-R50 eval", "PSPNet",
     {"backbone": "resnet50", "use_aux": True}, 8, False),
]

mesh = make_mesh()
rng = np.random.default_rng(0)
for label, name, kwargs, batch, train in CASES:
    model = get_model(name, num_classes=19, **kwargs)
    tx = make_optimizer(lr=0.01, num_epochs=100, iters_per_epoch=1000)
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               jnp.zeros((1, CROP, CROP, 3), jnp.float32))
    im, lb = shard_batch(mesh, (
        rng.normal(size=(batch, CROP, CROP, 3)).astype(np.float32),
        rng.integers(0, 19, size=(batch, CROP, CROP)).astype(np.int32)))
    key = jax.random.PRNGKey(1)
    try:
        if train:
            step = make_train_step(model, cross_entropy, 19, mesh=mesh)
            for _ in range(3):
                state, loss, _ = step(state, im, lb, key)
            float(loss)
            t0 = time.perf_counter()
            for _ in range(10):
                state, loss, _ = step(state, im, lb, key)
            float(loss)
        else:
            estep = make_eval_step(model, cross_entropy, 19, mesh=mesh)
            for _ in range(3):
                loss, _ = estep(state, im, lb)
            float(loss)
            t0 = time.perf_counter()
            for _ in range(10):
                loss, _ = estep(state, im, lb)
            float(loss)
        dt = (time.perf_counter() - t0) / 10
        print(f"{label}: bs={batch}  {batch / dt:.1f} imgs/sec/chip "
              f"({dt * 1000:.0f} ms/step)", flush=True)
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)
    del state, im, lb
