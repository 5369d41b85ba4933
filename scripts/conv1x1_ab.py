"""In-step A/B: 1x1-conv-as-dot_general (nn/layers.py::_ONE_BY_ONE_AS_DOT)
vs the XLA conv emitter, full PSPNet-R50 769^2 bs8 train step on the real
chip. The flag is read at import, so each arm runs in a subprocess."""
import os
import subprocess
import sys

ARM = os.environ.get("_CONV1X1_AB_ARM")

if ARM is None:
    here = os.path.abspath(__file__)
    for arm in ("0", "1"):
        env = dict(os.environ, _CONV1X1_AB_ARM=arm, SEGTPU_1X1_DOT=arm)
        subprocess.run([sys.executable, here], env=env, check=False)
    sys.exit(0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax, jax.numpy as jnp

from segtpu.core import (create_train_state, make_mesh, make_optimizer,
                         make_train_step, shard_batch)
from segtpu.losses import cross_entropy
from segtpu.models import get_model

CROP, NC, BS = 769, 19, 8
mesh = make_mesh()
rng = np.random.default_rng(0)
im, lb = shard_batch(mesh, (
    rng.normal(size=(BS, CROP, CROP, 3)).astype(np.float32),
    rng.integers(0, NC, size=(BS, CROP, CROP)).astype(np.int32)))
key = jax.random.PRNGKey(1)
model = get_model("PSPNet", num_classes=NC, backbone="resnet50", use_aux=True)
tx = make_optimizer(lr=0.01, num_epochs=100, iters_per_epoch=1000)
state = create_train_state(model, tx, jax.random.PRNGKey(0),
                           jnp.zeros((1, CROP, CROP, 3), jnp.float32))
step = make_train_step(model, cross_entropy, NC, mesh=mesh)
t0 = time.perf_counter()
for _ in range(3):
    state, loss, _ = step(state, im, lb, key)
lv = float(loss)
print(f"1x1_as_dot={ARM}: compile+warmup {time.perf_counter()-t0:.1f}s "
      f"loss {lv:.4f}", flush=True)
t0 = time.perf_counter()
for _ in range(10):
    state, loss, _ = step(state, im, lb, key)
float(loss)
dt = (time.perf_counter() - t0) / 10
print(f"1x1_as_dot={ARM}: {dt*1000:.1f} ms/step  {BS/dt:.2f} imgs/sec/chip",
      flush=True)
