"""Trace any zoo model's train/eval step on the real chip (round-5: the
sub-40%-MFU tail gets the same fix-or-roofline discipline PSPNet, ENet and
Xception got — VERDICT-r4 task 2/7).

Writes an xplane trace to /tmp/jaxtrace_<name>_<mode>; parse it with
``python scripts/opstats.py /tmp/jaxtrace_<name>_<mode>``. Timing forces the
loss scalar to host (block_until_ready is unreliable over the tunnel).

Usage:
    python scripts/model_profile.py SegResNet [train|eval] [batch] [k=v ...]
e.g.
    python scripts/model_profile.py GCN train 8 backbone=resnet50
    python scripts/model_profile.py PSPDenseNet train 4 backbone=densenet201
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import glob
import time

import numpy as np
import jax
import jax.numpy as jnp

from segtpu.core import (create_train_state, make_eval_step, make_mesh,
                         make_optimizer, make_train_step, shard_batch)
from segtpu.losses import cross_entropy
from segtpu.models import get_model

NAME = sys.argv[1]
MODE = sys.argv[2] if len(sys.argv) > 2 else "train"
B = int(sys.argv[3]) if len(sys.argv) > 3 else 8
KW = {}
for kv in sys.argv[4:]:
    k, v = kv.split("=", 1)
    KW[k] = (int(v) if v.isdigit()
             else {"true": True, "false": False}.get(v.lower(), v))
CROP = 769
TRACE_DIR = f"/tmp/jaxtrace_{NAME.lower()}_{MODE}"

mesh = make_mesh()
model = get_model(NAME, num_classes=19, **KW)
tx = make_optimizer(lr=0.01, num_epochs=100, iters_per_epoch=1000)
state = create_train_state(model, tx, jax.random.PRNGKey(0),
                           jnp.zeros((1, CROP, CROP, 3), jnp.float32))
rng = np.random.default_rng(0)
im, lb = shard_batch(mesh, (
    rng.normal(size=(B, CROP, CROP, 3)).astype(np.float32),
    rng.integers(0, 19, size=(B, CROP, CROP)).astype(np.int32)))
key = jax.random.PRNGKey(1)

if MODE == "train":
    step = make_train_step(model, cross_entropy, 19, mesh=mesh,
                           remat=bool(KW.pop("remat", False)))
    compiled = step.lower(state, im, lb, key).compile()

    def run(s):
        return compiled(s, im, lb, key)
else:
    estep = make_eval_step(model, cross_entropy, 19, mesh=mesh)
    compiled = estep.lower(state, im, lb).compile()

    def run(s):
        return (s, *compiled(s, im, lb))

try:
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    flops = float(ca.get("flops", 0.0))
    bts = float(ca.get("bytes accessed", 0.0))
    print(f"XLA-counted: {flops / 1e12:.2f} TFLOP/step, "
          f"{bts / 1e9:.1f} GB accessed/step "
          f"(floors: {flops / 197e12 * 1e3:.0f} ms compute, "
          f"{bts / 819e9 * 1e3:.0f} ms HBM)", flush=True)
except Exception as e:
    print("cost_analysis unavailable:", e, flush=True)

for _ in range(3):  # warm + steady-state
    out = run(state)
    state, loss = out[0], out[1]
float(loss)
t0 = time.monotonic()
N = 10
for _ in range(N):
    out = run(state)
    state, loss = out[0], out[1]
float(loss)
dt = (time.monotonic() - t0) / N
print(f"{NAME} {MODE} bs={B}: {dt * 1e3:.1f} ms/step "
      f"({B / dt:.1f} imgs/sec)", flush=True)

jax.profiler.start_trace(TRACE_DIR)
for _ in range(3):
    out = run(state)
    state, loss = out[0], out[1]
float(loss)
jax.profiler.stop_trace()
print("trace files:",
      glob.glob(f"{TRACE_DIR}/**/*.xplane.pb", recursive=True), flush=True)
