"""In-step A/B: PSPNet-R50 769^2 bs8 train step with and without the
space-to-depth stem (models/pspnet.py ``s2d_stem``, ops/s2d.py). Run on the
real chip; microbench wins don't survive fusion (the Lovász lesson) — this
is the deciding measurement. Unlike scripts/wgrad_ab.py's Pallas route this
is a pure XLA graph relayout: if the stride-1/4C stem emits better wgrads,
the win shows here with no layout-preamble tax to pay back."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

from segtpu.core import (create_train_state, make_mesh, make_optimizer,
                         make_train_step, shard_batch)
from segtpu.losses import cross_entropy
from segtpu.models import get_model

CROP, NC, BS = 769, 19, 8
mesh = make_mesh()
rng = np.random.default_rng(0)
images = rng.normal(size=(BS, CROP, CROP, 3)).astype(np.float32)
labels = rng.integers(0, NC, size=(BS, CROP, CROP)).astype(np.int32)
im, lb = shard_batch(mesh, (images, labels))
key = jax.random.PRNGKey(1)

for flag in (False, True):
    model = get_model("PSPNet", num_classes=NC, backbone="resnet50",
                      use_aux=True, s2d_stem=flag)
    tx = make_optimizer(lr=0.01, num_epochs=100, iters_per_epoch=1000)
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               jnp.zeros((1, CROP, CROP, 3), jnp.float32))
    step = make_train_step(model, cross_entropy, NC, mesh=mesh)
    t0 = time.perf_counter()
    for _ in range(3):
        state, loss, _ = step(state, im, lb, key)
    lv = float(loss)
    print(f"s2d_stem={flag}: compile+warmup "
          f"{time.perf_counter()-t0:.1f}s loss {lv:.4f}", flush=True)
    t0 = time.perf_counter()
    for _ in range(10):
        state, loss, _ = step(state, im, lb, key)
    float(loss)
    dt = (time.perf_counter() - t0) / 10
    print(f"s2d_stem={flag}: {dt*1000:.1f} ms/step  "
          f"{BS/dt:.2f} imgs/sec/chip", flush=True)
    del state
print("DONE", flush=True)
