"""Streaming segmentation metrics, device-resident.

Equivalent of reference utils/metrics.py (batch_pix_accuracy,
batch_intersection_union via ``torch.histc``, eval_metrics) — but designed so
the per-batch quantities are computed INSIDE the jitted step and accumulated
on device. The reference syncs device->host every iteration
(reference trainer.py:84-85, metrics.py:46,57 ``.cpu().numpy()``); here the
transfer happens only at log boundaries.

The histogram uses ``jnp.bincount(..., length=num_classes)``, which XLA lowers
to a static-shape scatter-add — the TPU answer to ``torch.histc``.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax.numpy as jnp
import numpy as np

from segtpu.ops.reductions import fast_argmax, onehot_first_max


class SegStats(NamedTuple):
    """Confusion-style accumulators (all float32 on device).

    Mirrors the 4-tuple of reference utils/metrics.py:59-67:
    ``correct, labeled`` (pixel accuracy) and per-class ``inter, union`` (IoU).
    """

    correct: jnp.ndarray  # scalar
    labeled: jnp.ndarray  # scalar
    inter: jnp.ndarray    # (num_classes,)
    union: jnp.ndarray    # (num_classes,)

    @staticmethod
    def zeros(num_classes: int) -> "SegStats":
        return SegStats(
            correct=jnp.zeros((), jnp.float32),
            labeled=jnp.zeros((), jnp.float32),
            inter=jnp.zeros((num_classes,), jnp.float32),
            union=jnp.zeros((num_classes,), jnp.float32),
        )

    def __add__(self, other: "SegStats") -> "SegStats":
        return SegStats(
            self.correct + other.correct,
            self.labeled + other.labeled,
            self.inter + other.inter,
            self.union + other.union,
        )


def seg_stats(pred: jnp.ndarray, target: jnp.ndarray, num_classes: int) -> SegStats:
    """Per-batch stats from integer predictions and targets (any shape).

    Pixels outside ``[0, num_classes)`` (the ignore sentinel — 255 or -1) are
    excluded, matching the +1-shift trick of reference utils/metrics.py:61-64.
    """
    pred = pred.reshape(-1).astype(jnp.int32)
    target = target.reshape(-1).astype(jnp.int32)
    valid = (target >= 0) & (target < num_classes)
    validf = valid.astype(jnp.float32)
    correct = jnp.sum((pred == target) & valid)
    labeled = jnp.sum(validf)

    # One-hot reductions instead of bincount: bincount lowers to a per-pixel
    # HBM scatter-add which dominated the train step on TPU (measured: 124 ms
    # of a 469 ms PSPNet-769^2 step); einsum('p,pc->c') is an MXU matvec.
    import jax

    match = ((pred == target) & valid).astype(jnp.float32)
    safe_pred = jnp.where(valid, pred, 0)
    safe_target = jnp.where(valid, target, 0)
    onehot_t = jax.nn.one_hot(safe_target, num_classes, dtype=jnp.float32)
    onehot_p = jax.nn.one_hot(safe_pred, num_classes, dtype=jnp.float32)
    inter = jnp.einsum("p,pc->c", match, onehot_t)
    area_pred = jnp.einsum("p,pc->c", validf, onehot_p)
    area_lab = jnp.einsum("p,pc->c", validf, onehot_t)
    union = area_pred + area_lab - inter
    return SegStats(correct.astype(jnp.float32), labeled, inter, union)


def seg_stats_from_logits(logits: jnp.ndarray, target: jnp.ndarray) -> SegStats:
    """Stats straight from (B, H, W, C) logits — argmax stays on device.

    Uses :func:`fast_argmax` (two monoid reduces) instead of ``jnp.argmax``'s
    variadic (value, index) reduce, then the one-hot metric einsums of
    :func:`seg_stats`. The index-free one-hot formulation
    (:func:`seg_stats_from_logits_onehot`) wins isolated but LOSES in-step:
    measured 212.8 vs 200.0 ms/step on PSPNet-R50 769² bs8 train (the eq-mask
    + (C, C) matmul materializes an extra (P, C) f32 tensor to HBM, while
    fast_argmax's compare/selects fuse into the loss one-hots) — the same
    microbench-vs-fusion trap as the Lovász histogram (see README rooflines).
    """
    c = logits.shape[-1]
    return seg_stats(_argmax(logits), target, c)


def _argmax(logits: jnp.ndarray) -> jnp.ndarray:
    """Prediction argmax. Default: :func:`packed_argmax` (one reduce_max
    over an int32 (bf16-key, rev-index) packing) when the logits are
    already 16-bit — exact there, and the measured in-step winner (UNet
    train 328.2 vs 362.1 ms/step, PSPNet see README) because it halves the
    lane-starved C=19 minor-axis reduce passes; :func:`fast_argmax` for
    wider dtypes where bf16 rounding could flip fp32 tie-breaking.
    SEGTPU_ARGMAX=fast|packed|jnp overrides for in-step A/Bs
    (scripts/argmax_ab.py)."""
    import os

    from segtpu.ops.reductions import packed_argmax

    variant = os.environ.get("SEGTPU_ARGMAX", "")
    if not variant:
        variant = "packed" if logits.dtype in (jnp.bfloat16, jnp.float16) \
            else "fast"
    if variant == "packed":
        return packed_argmax(logits, axis=-1)
    if variant == "jnp":
        return jnp.argmax(logits, axis=-1)
    return fast_argmax(logits, axis=-1)


def seg_stats_from_logits_onehot(logits: jnp.ndarray,
                                 target: jnp.ndarray) -> SegStats:
    """Index-free variant: the metric einsums consume the first-occurrence
    argmax ONE-HOT (:func:`onehot_first_max`) directly, skipping the
    class-axis index reduction entirely. Exactly equal to
    :func:`seg_stats_from_logits` (tie-breaking and ignore pixels included,
    proven in tests) but an in-step LOSER on the flagship — kept as a
    measured negative result (212.8 vs 200.0 ms/step, PSPNet-R50 769² bs8).
    """
    import jax

    c = logits.shape[-1]
    onehot_p = onehot_first_max(logits.reshape(-1, c))
    target = target.reshape(-1).astype(jnp.int32)
    valid = (target >= 0) & (target < c)
    validf = valid.astype(jnp.float32)
    safe_target = jnp.where(valid, target, 0)
    onehot_t = jax.nn.one_hot(safe_target, c, dtype=jnp.float32)
    onehot_tv = onehot_t * validf[:, None]
    # onehot_p rows sum to 1, so sum_c onehot_p*onehot_t == (pred == target).
    inter = jnp.einsum("pc,pc->c", onehot_p, onehot_tv)
    area_pred = jnp.einsum("p,pc->c", validf, onehot_p)
    area_lab = jnp.sum(onehot_tv, axis=0)
    union = area_pred + area_lab - inter
    return SegStats(jnp.sum(inter), jnp.sum(validf), inter, union)


def summarize(stats: SegStats) -> Dict[str, np.ndarray]:
    """Host-side summary: pixel accuracy, mIoU, per-class IoU.

    Matches reference trainer.py:186-194 (_get_seg_metrics) including the
    1e-10 epsilon and rounding conventions.
    """
    correct = np.asarray(stats.correct)
    labeled = np.asarray(stats.labeled)
    inter = np.asarray(stats.inter)
    union = np.asarray(stats.union)
    pix_acc = 1.0 * correct / (np.spacing(1, dtype=np.float64) + labeled)
    iou = 1.0 * inter / (np.spacing(1, dtype=np.float64) + union)
    return {
        "Pixel_Accuracy": np.round(pix_acc, 3),
        "Mean_IoU": np.round(iou.mean(), 3),
        "Class_IoU": dict(zip(range(len(iou)), np.round(iou, 3))),
    }


def eval_metrics(logits, target, num_classes: int) -> SegStats:
    """API-parity alias (reference utils/metrics.py:59-67 returns the
    [correct, labeled, inter, union] 4-tuple; here the same quantities as a
    SegStats, device-resident)."""
    return seg_stats(_argmax(logits), target, num_classes)


class AverageMeter:
    """Weighted streaming mean (reference utils/metrics.py:6-40)."""

    def __init__(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0.0

    def update(self, val, weight=1):
        self.val = val
        self.sum += val * weight
        self.count += weight

    @property
    def average(self):
        return self.sum / max(self.count, 1e-12)
