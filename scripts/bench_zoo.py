"""Measured-throughput sweep for the README table (real TPU).

One line per case: train (or eval) imgs/sec/chip at 769x769 bf16 plus MFU
(XLA-counted FLOPs / wall-clock vs the v5e 197 TFLOP/s bf16 peak), timed by
forcing the loss scalar to host (see CLAUDE.md: block_until_ready is
unreliable over the tunnel). Each case compiles ONCE via AOT
``lower().compile()`` — the same executable serves cost-analysis and the
timed loop (the double-compile pattern cost round 2 its bench artifact).

Usage: ``python scripts/bench_zoo.py [group ...]`` where group is one of
``r3`` (the 7 round-3 headline cases), ``rest-train`` / ``rest-eval``
(10 cases covering the 9 families the round-3 table left unmeasured,
plus a DeepLab-R101 re-measure), or a model registry name substring.
No args = everything.

On OOM a train case first retries the SAME batch with ``remat=True``
(jax.checkpoint — the knob that exists for exactly this), then falls
back 8 -> 4 -> 2; every fallback is annotated on the printed row so the
README table never silently mixes batch bases.
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
PEAK = 197e12  # v5e bf16

# (label, registry name, kwargs, batch candidates, train?, group)
R3 = [
    ("PSPNet-R50 (+aux) train", "PSPNet",
     {"backbone": "resnet50", "use_aux": True}, (8,), True),
    ("PSPNet-R101 (+aux) train", "PSPNet",
     {"backbone": "resnet101", "use_aux": True}, (8,), True),
    ("DeepLabV3+ Xception train", "DeepLab",
     {"backbone": "xception", "output_stride": 16}, (8,), True),
    ("ENet train", "ENet", {}, (16,), True),
    ("PSPNet-R50 eval", "PSPNet",
     {"backbone": "resnet50", "use_aux": True}, (8,), False),
    ("PSPNet-R50 eval bs16", "PSPNet",
     {"backbone": "resnet50", "use_aux": True}, (16,), False),
    ("DeepLabV3+ Xception eval", "DeepLab",
     {"backbone": "xception", "output_stride": 16}, (8,), False),
]

# The 9 families the round-3 table left unmeasured (plus a DeepLab-R101
# re-measure), at their reference default backbones (reference
# models/*.py constructor defaults).
REST = [
    ("FCN8", "FCN8", {}),
    ("UNet", "UNet", {}),
    ("UNetResnet-R50", "UNetResnet", {"backbone": "resnet50"}),
    ("SegNet", "SegNet", {}),
    ("SegResNet-R50", "SegResNet", {}),
    ("GCN-R50", "GCN", {"backbone": "resnet50"}),
    ("DeepLab-R101", "DeepLab", {"backbone": "resnet101"}),
    ("DUC-HDC-R101", "DeepLab_DUC_HDC", {"backbone": "resnet101"}),
    ("UperNet-R101", "UperNet", {"backbone": "resnet101"}),
    ("PSPDenseNet-201", "PSPDenseNet", {"backbone": "densenet201"}),
]

CASES = [(label, name, kw, batches, train, "r3")
         for (label, name, kw, batches, train) in R3]
CASES += [(f"{label} train", name, kw, (8, 4, 2), True, "rest-train")
          for (label, name, kw) in REST]
CASES += [(f"{label} eval", name, kw, (8, 4, 2), False, "rest-eval")
          for (label, name, kw) in REST]


def run_case(label, name, kwargs, batch, train, mesh, rng,
             remat=False, note=""):
    # Prefer the model's own structured remat (per-block / per-dense-layer,
    # e.g. the memory-efficient DenseNet) over whole-step jax.checkpoint:
    # whole-step replay re-stores the same residuals and measured NO memory
    # relief on PSPDenseNet-201 (still OOM at bs8 in the round-4 sweep).
    step_remat = remat
    if remat and "remat_backbone" in getattr(
            get_model(name, num_classes=19, **kwargs),
            "__dataclass_fields__", {}):
        kwargs = dict(kwargs, remat_backbone=True)
        step_remat = False
    model = get_model(name, num_classes=19, **kwargs)
    tx = make_optimizer(lr=0.01, num_epochs=100, iters_per_epoch=1000)
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               jnp.zeros((1, CROP, CROP, 3), jnp.float32))
    im, lb = shard_batch(mesh, (
        rng.normal(size=(batch, CROP, CROP, 3)).astype(np.float32),
        rng.integers(0, 19, size=(batch, CROP, CROP)).astype(np.int32)))
    key = jax.random.PRNGKey(1)
    if train:
        step = make_train_step(model, cross_entropy, 19, mesh=mesh,
                               remat=step_remat)
        compiled = step.lower(state, im, lb, key).compile()
        run = lambda s: compiled(s, im, lb, key)  # noqa: E731
    else:
        estep = make_eval_step(model, cross_entropy, 19, mesh=mesh)
        compiled = estep.lower(state, im, lb).compile()
        run = lambda s: (s, *compiled(s, im, lb))  # noqa: E731
    flops = None
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass
    for _ in range(3):
        state, loss, *_ = run(state)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(10):
        state, loss, *_ = run(state)
    float(loss)
    dt = (time.perf_counter() - t0) / 10
    mfu = f"  MFU {flops / dt / PEAK:.1%}" if flops else ""
    tag = (" remat(backbone)" if remat and not step_remat
           else " remat" if remat else "")
    print(f"{label}: bs={batch}{tag}{note}  {batch / dt:.1f} imgs/sec/chip "
          f"({dt * 1000:.0f} ms/step){mfu}", flush=True)


def main():
    import gc
    sel = sys.argv[1:]
    mesh = make_mesh()
    rng = np.random.default_rng(0)
    for label, name, kwargs, batches, train, group in CASES:
        if sel and not any(s in (group, name) or s in label for s in sel):
            continue
        # Attempt order: plain at batches[0]; on failure remat at the SAME
        # batch (train only, and only when fallback batches exist — the r3
        # cases pin a single known-good batch); then smaller batches.
        attempts = [(batches[0], False, "")]
        if train and len(batches) > 1:
            attempts.append((batches[0], True, f" (OOM at {batches[0]})"))
        for b in batches[1:]:
            attempts.append((b, False, f" (OOM at {batches[0]}"
                             + (", remat too)" if train else ")")))
        last = None
        for batch, remat, note in attempts:
            try:
                run_case(label, name, kwargs, batch, train, mesh, rng,
                         remat=remat, note=note)
                last = None
                break
            except Exception as e:
                # String only — keeping the exception pins run_case's frame
                # (state/im/compiled) and the failed attempt's HBM would stay
                # allocated under the retry.
                last = f"{type(e).__name__}: {str(e)[:160]}"
                del e
                gc.collect()
        if last is not None:
            print(f"{label}: FAILED {last}", flush=True)
        # Free EVERYTHING between cases: a leftover compiled executable +
        # loss buffer kept prior cases' HBM alive and depressed the eval
        # cases run late in the sweep by ~25% (measured round 3: eval bs8
        # 122 img/s in-sweep vs 161 fresh). gc before the next allocation
        # restores it; run_case's locals die with the frame.
        gc.collect()


if __name__ == "__main__":
    main()
