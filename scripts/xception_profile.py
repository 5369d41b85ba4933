"""Trace the DeepLabV3+ Aligned-Xception train (or eval) step on the real
chip (VERDICT-r3 item 3: the zoo's #2 architecture trains at 33.9% MFU with
no profile — publish its roofline before attempting any fix).

Writes an xplane trace to /tmp/jaxtrace_xc_{train|eval}; parse with
``xprof.convert.raw_to_tool_data`` tool "framework_op_stats" (see CLAUDE.md
perf-probe notes). Timing sanity: the loss scalar is forced to host
(block_until_ready is unreliable over the tunnel).

Usage: python scripts/xception_profile.py [train|eval] [batch]
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

MODE = sys.argv[1] if len(sys.argv) > 1 else "train"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
CROP = 769
TRACE_DIR = f"/tmp/jaxtrace_xc_{MODE}"

mesh = make_mesh()
model = get_model("DeepLab", num_classes=19, backbone="xception",
                  output_stride=16)
tx = make_optimizer(lr=0.01, num_epochs=100, iters_per_epoch=1000)
state = create_train_state(model, tx, jax.random.PRNGKey(0),
                           jnp.zeros((1, CROP, CROP, 3), jnp.float32))
rng = np.random.default_rng(0)
im, lb = shard_batch(mesh, (
    rng.normal(size=(B, CROP, CROP, 3)).astype(np.float32),
    rng.integers(0, 19, size=(B, CROP, CROP)).astype(np.int32)))
key = jax.random.PRNGKey(1)

if MODE == "train":
    step = make_train_step(model, cross_entropy, 19, mesh=mesh)
    compiled = step.lower(state, im, lb, key).compile()

    def run(s):
        return compiled(s, im, lb, key)
else:
    estep = make_eval_step(model, cross_entropy, 19, mesh=mesh)
    compiled = estep.lower(state, im, lb).compile()

    def run(s):
        return (s, *compiled(s, im, lb))

try:
    flops = compiled.cost_analysis()["flops"]
    print(f"XLA-counted TFLOP/{MODE}-step: {flops / 1e12:.2f}", flush=True)
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
print(f"{MODE} step: {dt * 1e3:.1f} ms  ({B / dt:.1f} imgs/sec)", flush=True)

jax.profiler.start_trace(TRACE_DIR)
for _ in range(3):
    out = run(state)
    state, loss = out[0], out[1]
float(loss)
jax.profiler.stop_trace()
print("trace files:",
      glob.glob(f"{TRACE_DIR}/**/*.xplane.pb", recursive=True), flush=True)
