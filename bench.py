#!/usr/bin/env python
"""Headline benchmark: PSPNet-ResNet50 Cityscapes-crop (769x769) training
throughput, imgs/sec/chip.

Baseline for ``vs_baseline``: the reference publishes NO speed numbers
(SURVEY.md §6), so the baseline is a V100 estimate for the same model/crop
under torch 1.1 DataParallel fp32: ~7 imgs/sec/chip (PSPNet-R50 stride-8 at
769^2 is ~0.75 TFLOPs/img trained; V100 fp32 at ~35% efficiency sustains
~5.5 TFLOPs). The BASELINE.json north star is >=2x that on a v5e chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Deadline-safety (the round-2 bench timed out with NO output — never again):

* All work runs in a daemon worker thread; the MAIN thread only waits, so it
  can always emit the JSON line — even if a tunnel RPC hangs the worker in C
  code where Python signal handlers can't run.
* SIGTERM/SIGINT (what ``timeout`` sends) and an internal deadline
  (``BENCH_DEADLINE_S``, default 3000s) both emit a JSON line with the
  phase reached, then hard-exit. The internal deadline is a HANG guard
  only — it sits above any plausible cold-compile time (observed ~10 min)
  so it can never cut off a run the driver's own timeout would allow; the
  driver's SIGTERM is the real cutoff and still yields a parseable line.
* The train step is compiled exactly ONCE via AOT ``lower().compile()`` and
  that executable is reused for cost-analysis, warmup, and the timed loop.
  (Round 2 compiled twice — cost-analysis + jit — and two cold server-side
  compiles blew the driver timeout.)
* The client-side persistent compilation cache is deliberately NOT used: a
  measured probe (2026-08-17) showed cache-hit deserialized executables HANG
  at execution over the axon tunnel (same failure family as jax.export
  artifacts); a fresh AOT compile+execute works.
"""

import json
import os
import signal
import sys
import threading
import time

V100_BASELINE_IMGS_PER_SEC = 7.0
CROP = 769
NUM_CLASSES = 19
# XLA-counted fallback if cost_analysis fails (measured r2: 22.3 TFLOP/step
# at batch 8; scaled per-image below). Used only when the live count fails.
FALLBACK_FLOPS_PER_IMG = 22.3e12 / 8.0
TPU_V5E_BF16_PEAK = 197e12

STATUS = {"phase": "init", "result": None}


def emit(payload):
    sys.stdout.write(json.dumps(payload) + "\n")
    sys.stdout.flush()


def partial_json(reason):
    return {
        "metric": f"pspnet_r50_cityscapes_{CROP}px_train_throughput",
        "value": 0.0,
        "unit": "imgs/sec/chip",
        "vs_baseline": 0.0,
        "error": f"{reason} at phase {STATUS['phase']}"[:300],
    }


def run_bench():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from segtpu.core import (create_train_state, make_mesh, make_optimizer,
                             make_train_step, shard_batch)
    from segtpu.losses import cross_entropy
    from segtpu.models import get_model

    STATUS["phase"] = "build"
    n_chips = len(jax.devices())
    mesh = make_mesh()
    model = get_model("PSPNet", num_classes=NUM_CLASSES, backbone="resnet50",
                      use_aux=True)
    tx = make_optimizer(lr=0.01, num_epochs=100, iters_per_epoch=1000)

    rng = np.random.default_rng(0)
    last_err = None
    for batch in (8 * n_chips, 4 * n_chips, 2 * n_chips, n_chips):
        try:
            STATUS["phase"] = f"init_state(bs={batch})"
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

            # ONE compile: the AOT executable serves cost-analysis AND the
            # run. (lower().compile() returns fast over the tunnel; the
            # server-side compile actually happens at first execution.)
            STATUS["phase"] = f"compile(bs={batch})"
            compiled = step.lower(state, images_d, labels_d, key).compile()
            flops_per_step = None
            try:
                ca = compiled.cost_analysis()
                ca = ca[0] if isinstance(ca, list) else ca
                flops_per_step = float(ca.get("flops", 0.0)) or None
            except Exception:
                pass

            # warmup (first call pays the server compile: 4-12 min cold).
            # Sync via scalar D2H (float(loss)) — on this tunnel platform
            # block_until_ready can return before the queue drains.
            STATUS["phase"] = f"warmup(bs={batch})"
            for _ in range(3):
                state, loss, _ = compiled(state, images_d, labels_d, key)
            float(loss)

            STATUS["phase"] = f"timed(bs={batch})"
            n_steps = 10
            t0 = time.perf_counter()
            for _ in range(n_steps):
                state, loss, _ = compiled(state, images_d, labels_d, key)
            float(loss)
            dt = time.perf_counter() - t0
            if dt < n_steps * 1e-3:
                raise RuntimeError(f"bogus timing: {dt:.4f}s for {n_steps} steps")

            imgs_per_sec_per_chip = (batch * n_steps) / dt / n_chips
            est = flops_per_step is None
            fl = flops_per_step or FALLBACK_FLOPS_PER_IMG * batch
            tflops = fl / (dt / n_steps) / 1e12 / n_chips
            mfu = tflops * 1e12 / TPU_V5E_BF16_PEAK
            return dict(value=imgs_per_sec_per_chip, batch=batch,
                        flops=fl, mfu=mfu, flops_estimated=est)
        except Exception as e:  # OOM at this batch size -> try smaller
            last_err = e
            continue
    raise RuntimeError(f"all batch sizes failed: {last_err}")


def worker():
    try:
        STATUS["result"] = run_bench()
    except Exception as e:
        STATUS["result"] = {"error": f"{type(e).__name__}: {e}"[:300]}


def main():
    deadline = float(os.environ.get("BENCH_DEADLINE_S", "3000"))
    t_start = time.monotonic()

    def bail(signum, frame):
        emit(partial_json(f"signal {signum}"))
        os._exit(0)

    signal.signal(signal.SIGTERM, bail)
    signal.signal(signal.SIGINT, bail)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while t.is_alive() and time.monotonic() - t_start < deadline:
        t.join(timeout=1.0)
    r = STATUS["result"]
    if r is None:  # worker still running (hung or slow) -> partial line
        emit(partial_json("deadline"))
        os._exit(0)
    if "error" in r:
        emit(partial_json(r["error"]))
        os._exit(0)
    out = {
        "metric": f"pspnet_r50_cityscapes_{CROP}px_train_throughput",
        "value": round(r["value"], 3),
        "unit": "imgs/sec/chip",
        "vs_baseline": round(r["value"] / V100_BASELINE_IMGS_PER_SEC, 3),
        "batch": r["batch"],
        "tflops_per_step": round(r["flops"] / 1e12, 2),
        "mfu": round(r["mfu"], 3),
    }
    if r["flops_estimated"]:
        out["mfu_note"] = "cost_analysis failed; FLOPs from r2 constant"
    emit(out)
    os._exit(0)


if __name__ == "__main__":
    main()
