"""TPU inference-path benchmark (round-4 verdict, weak item 5).

End-to-end wall-clock of the user-facing prediction paths
(segtpu/inference_lib.py) on a 2048x1024 Cityscapes-sized frame with
PSPNet-R50 (19 classes):

* ``sliding_predict`` (flip, tile=H/2.5, overlap 1/3 — reference
  inference.py:26-58 geometry: 24 tiles of 409x819, x2 flip = 48
  forwards/frame): the batched-tiles design (max_tile_batch=16, ONE
  compiled (16,409,819,3) forward per chunk) A/B'd against the naive
  per-tile loop (max_tile_batch=1 — the reference's one-model-call-per-
  tile shape), each in float32 (CLI default) and bfloat16 (--dtype).
* ``multi_scale_predict`` at the CityScapes CLI scale set
  (inference.py:60-62), float32 vs bfloat16, plus the bf16-vs-fp32
  argmax agreement that justifies shipping the bfloat16 option.

Timing: wall-clock around the full call — every path returns host numpy,
so the clock stops only after the device queue has drained (CLAUDE.md:
never trust block_until_ready over the tunnel).

Usage: ``python scripts/bench_inference.py [sliding|multiscale|agree ...]``
(no args = everything). Expect ~20-30 min of XLA compiles on first run.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax.numpy as jnp

from segtpu.inference_lib import (make_predictor, multi_scale_predict,
                                  sliding_predict)
from segtpu.models import get_model

H, W, NC = 1024, 2048, 19
SCALES = [0.75, 1.0, 1.25, 1.5, 1.75, 2.0, 2.25]  # CityScapes CLI set


def _build(compute_dtype):
    import jax

    model = get_model("PSPNet", num_classes=NC, backbone="resnet50",
                      use_aux=True)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)
    return make_predictor(model, variables["params"],
                          variables.get("batch_stats", {}),
                          compute_dtype=compute_dtype)


def _frame():
    rng = np.random.default_rng(0)
    return rng.normal(size=(H, W, 3)).astype(np.float32)


def _time(fn, reps=2):
    fn()  # warm: compiles + first run
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    return (time.perf_counter() - t0) / reps, out


def bench_sliding(image, predictors):
    for dname, predict in predictors.items():
        for mtb, tag in ((16, "batched tiles (mtb=16)"),
                         (1, "per-tile loop  (mtb=1)")):
            dt, _ = _time(lambda: sliding_predict(
                predict, image, NC, flip=True, max_tile_batch=mtb,
                class_map=True))
            print(f"sliding {dname:8s} {tag}: {dt:.2f} s/frame "
                  f"({dt / 48 * 1000:.0f} ms per forward incl. host)",
                  flush=True)
        # One row with the full (H, W, C) float32 canvas download, to
        # quantify what class_map=True avoids on this host link.
        dt, _ = _time(lambda: sliding_predict(
            predict, image, NC, flip=True, max_tile_batch=16))
        print(f"sliding {dname:8s} + full canvas download: {dt:.2f} s/frame",
              flush=True)


def bench_multiscale(image, predictors):
    for dname, predict in predictors.items():
        dt, _ = _time(lambda: multi_scale_predict(predict, image, SCALES, NC,
                                                  class_map=True))
        print(f"multiscale {dname:8s} ({len(SCALES)} scales): "
              f"{dt:.2f} s/frame ({dt / len(SCALES) * 1000:.0f} ms per "
              f"scale incl. zoom+resize)", flush=True)


def bench_agreement(image, predictors):
    a = sliding_predict(predictors["float32"], image, NC, flip=True,
                        class_map=True)
    b = sliding_predict(predictors["bfloat16"], image, NC, flip=True,
                        class_map=True)
    frac = float(np.mean(a != b))
    print(f"bf16-vs-fp32 sliding argmax disagreement: {frac:.2%} of pixels",
          flush=True)


def main():
    sel = sys.argv[1:]
    image = _frame()
    predictors = {"float32": _build(None), "bfloat16": _build(jnp.bfloat16)}
    if not sel or any("slid" in s for s in sel):
        bench_sliding(image, predictors)
    if not sel or any("multi" in s for s in sel):
        bench_multiscale(image, predictors)
    if not sel or any("agree" in s for s in sel):
        bench_agreement(image, predictors)


if __name__ == "__main__":
    main()
