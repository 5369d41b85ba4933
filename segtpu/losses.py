"""Segmentation losses, jit-safe and NHWC.

Functional equivalents of reference utils/losses.py (CrossEntropyLoss2d,
DiceLoss, FocalLoss, CE_DiceLoss, LovaszSoftmax) and the vendored
utils/lovasz_losses.py, re-derived for XLA:

* logits are (B, H, W, C) float, labels are (B, H, W) int with an
  ``ignore_index`` sentinel (255 for VOC/Cityscapes/COCO, -1 for ADE20K).
* ignore handling is mask arithmetic, never boolean indexing — shapes stay
  static so everything fuses into the backward pass under jit.
* Lovász's data-dependent "present classes" filter becomes a mask + sorted
  reduction (``jax.lax.sort``), see :func:`lovasz_softmax`.

Every loss returns a scalar in float32.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def _valid_mask(target: jnp.ndarray, num_classes: int, ignore_index: int) -> jnp.ndarray:
    """1.0 where the pixel participates in the loss."""
    valid = (target != ignore_index) & (target >= 0) & (target < num_classes)
    return valid.astype(jnp.float32)


def _per_pixel_ce(logits: jnp.ndarray, target: jnp.ndarray, valid: jnp.ndarray,
                  weight: Optional[jnp.ndarray] = None):
    """Per-pixel cross-entropy (zeros at ignored pixels) and per-pixel weight.

    TPU note: the label pick is a one-hot multiply-sum, NOT take_along_axis —
    on TPU the latter lowers to a per-pixel HBM gather that dominated the
    whole train step (measured: 137 ms of a 469 ms PSPNet-769^2 step); the
    one-hot form fuses into the surrounding elementwise ops.
    """
    # at-least-float32: bf16 upcasts as before; float64 (x64 parity tests)
    # stays float64 so gradient noise isn't re-floored at fp32.
    logits = logits.astype(jnp.promote_types(logits.dtype, jnp.float32))
    safe_target = jnp.where(valid > 0, target, 0).astype(jnp.int32)
    onehot = jax.nn.one_hot(safe_target, logits.shape[-1], dtype=logits.dtype)
    logz = jax.nn.logsumexp(logits, axis=-1)
    picked = jnp.sum(logits * onehot, axis=-1)
    ce = (logz - picked) * valid
    if weight is not None:
        wvec = jnp.asarray(weight, jnp.float32)
        w_pick = jnp.sum(onehot * wvec, axis=-1)
        ce = ce * w_pick
        w = w_pick * valid
    else:
        w = valid
    return ce, w


def cross_entropy(logits, target, ignore_index=255, weight=None):
    """Mean CE over non-ignored pixels; optional per-class weights use torch's
    weighted-mean convention (divide by the sum of picked weights).
    Parity: reference utils/losses.py:24-31 (nn.CrossEntropyLoss)."""
    num_classes = logits.shape[-1]
    valid = _valid_mask(target, num_classes, ignore_index)
    ce, w = _per_pixel_ce(logits, target, valid, weight)
    return jnp.sum(ce) / jnp.maximum(jnp.sum(w), 1.0)


def dice_loss(logits, target, ignore_index=255, smooth=1.0):
    """Soft dice over softmax probabilities vs one-hot target.

    Reference utils/losses.py:33-50 zeroes ignored labels by rewriting them to
    ``target.min()`` (a data-dependent hack); here ignored pixels are excluded
    from both the prediction and target sums via masking, which is the intended
    semantics and is jit-safe.
    """
    num_classes = logits.shape[-1]
    valid = _valid_mask(target, num_classes, ignore_index)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    safe_target = jnp.where(valid > 0, target, 0).astype(jnp.int32)
    onehot = jax.nn.one_hot(safe_target, num_classes, dtype=jnp.float32)
    onehot = onehot * valid[..., None]
    probs = probs * valid[..., None]
    intersection = jnp.sum(probs * onehot)
    denom = jnp.sum(probs) + jnp.sum(onehot)
    return 1.0 - (2.0 * intersection + smooth) / (denom + smooth)


def focal_loss(logits, target, ignore_index=255, gamma=2.0, alpha=None):
    """(1-p)^gamma * CE. Matches reference utils/losses.py:52-65 exactly,
    including its quirk: the final mean divides by ALL pixels (ignored pixels
    contribute zeros to the numerator but still count in the denominator,
    because torch's ``reduce=False`` CE emits 0 there and ``.mean()`` is
    global)."""
    num_classes = logits.shape[-1]
    valid = _valid_mask(target, num_classes, ignore_index)
    ce, _ = _per_pixel_ce(logits, target, valid, alpha)
    pt = jnp.exp(-ce)
    focal = ((1.0 - pt) ** gamma) * ce * valid
    return jnp.mean(focal)


def ce_dice_loss(logits, target, ignore_index=255, smooth=1.0, weight=None):
    """CE + Dice (reference utils/losses.py:67-77)."""
    return (
        cross_entropy(logits, target, ignore_index, weight)
        + dice_loss(logits, target, ignore_index, smooth)
    )


def lovasz_softmax(logits, target, ignore_index=255, per_image=False):
    """Lovász-Softmax with ``classes='present'`` (multi-class IoU surrogate).

    Re-derivation of the vendored Berman implementation (reference
    utils/lovasz_losses.py:153-217) under jit constraints:

    * flattening + ignore filtering becomes a validity mask carried through a
      multi-operand ``lax.sort`` (invalid pixels sort to the tail with error
      key -1 and contribute zero via the mask);
    * the Lovász extension gradient is the discrete derivative of the Jaccard
      of the sorted ground-truth indicator — pure cumsum arithmetic;
    * ``classes='present'`` becomes a per-class presence mask and a division
      by the number of present classes.
    """
    num_classes = logits.shape[-1]

    def one_image(lg, tg):
        valid = _valid_mask(tg, num_classes, ignore_index).reshape(-1)
        probs = jax.nn.softmax(lg.astype(jnp.float32), axis=-1).reshape(-1, num_classes)
        tflat = jnp.where(valid > 0, tg.reshape(-1), 0).astype(jnp.int32)
        fg = jax.nn.one_hot(tflat, num_classes, dtype=jnp.float32) * valid[:, None]

        errors = jnp.abs(fg - probs) * valid[:, None]  # (P, C)
        # Sort each class column by descending error; carry fg and valid along.
        sort_key = -errors.T  # (C, P) ascending sort == descending errors
        neg_sorted, fg_sorted, valid_sorted = jax.lax.sort(
            (sort_key, fg.T, jnp.broadcast_to(valid, (num_classes, valid.shape[0]))),
            dimension=1,
            num_keys=1,
        )
        errors_sorted = -neg_sorted

        gts = jnp.sum(fg_sorted, axis=1, keepdims=True)  # (C, 1)
        cum_fg = jnp.cumsum(fg_sorted, axis=1)
        intersection = gts - cum_fg
        union = gts + jnp.cumsum((1.0 - fg_sorted) * valid_sorted, axis=1)
        jaccard = 1.0 - intersection / jnp.maximum(union, 1e-12)
        grad = jnp.concatenate(
            [jaccard[:, :1], jaccard[:, 1:] - jaccard[:, :-1]], axis=1
        )
        per_class = jnp.sum(errors_sorted * grad * valid_sorted, axis=1)  # (C,)
        present = (gts[:, 0] > 0).astype(jnp.float32)
        return jnp.sum(per_class * present) / jnp.maximum(jnp.sum(present), 1.0)

    if per_image:
        return jnp.mean(jax.vmap(one_image)(logits, target))
    return one_image(logits, target)


def lovasz_softmax_binned(logits, target, ignore_index=255, bins=128):
    """Histogram-binned Lovász-Softmax — the TPU-fast variant.

    The exact Lovász (above) sorts every class column of (P, C) errors;
    at Cityscapes training shapes that sort costs ~4 s/step on a v5e chip
    (measured), 20x the rest of the step. This variant replaces the sort
    with prefix statistics at ``bins`` error thresholds:

    * cum_fg(b)  = #foreground pixels with error >= t_b,
    * cum_all(b) = #valid pixels with error >= t_b,
    * errsum(b)  = sum of errors in (t_b, t_{b-1}],

    all computed as broadcast compare + einsum (no gather, no scatter, no
    sort — see ops/lovasz_hist.py, which also carries a bucketize+one-hot
    MXU variant). The Lovász extension's telescoping gradient is then
    evaluated at bin boundaries: loss_c = sum_b mean_err(b) * (J(b) - J(b-1)).
    Exact when every pixel in a bin shares one error value; otherwise the
    approximation error is bounded by the bin width (1/bins). Like the exact
    form, the threshold masks are treated as constants under autodiff (the
    sort permutation is detached in the reference too).
    """
    from segtpu.ops.lovasz_hist import histograms_compare

    num_classes = logits.shape[-1]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    probs = probs.reshape(-1, num_classes)
    tflat = target.reshape(-1).astype(jnp.int32)
    valid = ((tflat != ignore_index) & (tflat >= 0)
             & (tflat < num_classes)).astype(jnp.float32)
    safe_t = jnp.where(valid > 0, tflat, 0)

    # Prefix statistics at `bins` descending error thresholds 1 -> 1/bins,
    # as broadcast compare + einsum (segtpu/ops/lovasz_hist.py). In-step
    # A/B on a v5e at Cityscapes shapes: 442 ms/step vs 492 ms for the
    # bucketize+one-hot MXU form (which wins 68 vs 171 ms in isolation but
    # loses fused into the full train step) and 578 ms for a hand-written
    # Pallas kernel (removed; see git history).
    cum_fg, cum_all, cum_err = histograms_compare(probs, tflat, bins,
                                                  ignore_index)

    onehot = jax.nn.one_hot(safe_t, num_classes, dtype=jnp.float32)
    gts = jnp.einsum("p,pc->c", valid, onehot)  # per-class fg counts
    inter = gts[:, None] - cum_fg
    union = gts[:, None] + (cum_all - cum_fg)
    jacc = 1.0 - inter / jnp.maximum(union, 1e-12)
    # J at prefix length 0 is 0 (empty prefix: inter = union = gts)
    jacc_prev = jnp.concatenate([jnp.zeros_like(jacc[:, :1]), jacc[:, :-1]],
                                axis=1)
    grad = jacc - jacc_prev  # (C, K) telescoped Lovász gradient per bin
    bin_err = cum_err - jnp.concatenate(
        [jnp.zeros_like(cum_err[:, :1]), cum_err[:, :-1]], axis=1)
    bin_cnt = jax.lax.stop_gradient(cum_all - jnp.concatenate(
        [jnp.zeros_like(cum_all[:, :1]), cum_all[:, :-1]], axis=1))
    mean_err = bin_err / jnp.maximum(bin_cnt, 1.0)
    per_class = jnp.sum(mean_err * grad * (bin_cnt > 0), axis=1)
    present = (gts > 0).astype(jnp.float32)
    return jnp.sum(per_class * present) / jnp.maximum(jnp.sum(present), 1.0)


def lovasz_softmax_auto(logits, target, ignore_index=255, **kw):
    """The config name ``LovaszSoftmax`` resolves here: binned on TPU, exact
    elsewhere.

    The exact form's per-class ``lax.sort`` over (P, C) errors costs
    4053 ms/step at Cityscapes shapes on a v5e chip vs 447 ms binned
    (measured; sorts don't map to the MXU). The binned approximation error is
    bounded by the bin width (1/128 by default, see lovasz_softmax_binned);
    opt into the exact semantics with the config name ``LovaszSoftmaxExact``.
    Reference semantics: utils/lovasz_losses.py:153-199.

    ``per_image`` (reference utils/lovasz_losses.py:159) is only meaningful
    for the exact form; a config passing it routes there on every backend
    (the binned approximation is batch-global by construction).
    """
    if kw.get("per_image"):
        return lovasz_softmax(logits, target, ignore_index=ignore_index, **kw)
    kw.pop("per_image", None)
    if jax.default_backend() == "tpu":
        return lovasz_softmax_binned(logits, target,
                                     ignore_index=ignore_index, **kw)
    return lovasz_softmax(logits, target, ignore_index=ignore_index, **kw)


def lovasz_hinge(logits, target, ignore_index=255, per_image=True):
    """Binary Lovász hinge (reference utils/lovasz_losses.py:78-109).

    ``logits`` (..., H, W) real-valued, ``target`` binary {0,1} with an
    ignore sentinel. The reference's boolean-index filtering becomes a
    validity mask carried through the sort (invalid pixels get error -inf so
    they sort last and contribute zero).
    """

    def one_image(lg, tg):
        lg = lg.reshape(-1).astype(jnp.float32)
        tg = tg.reshape(-1)
        valid = (tg != ignore_index).astype(jnp.float32)
        tgf = jnp.where(valid > 0, tg, 0).astype(jnp.float32)
        signs = 2.0 * tgf - 1.0
        errors = (1.0 - lg * signs)
        errors = jnp.where(valid > 0, errors, -jnp.inf)
        neg_sorted, fg_sorted, valid_sorted = jax.lax.sort(
            (-errors, tgf * valid, valid), dimension=0, num_keys=1)
        errors_sorted = -neg_sorted
        gts = jnp.sum(fg_sorted)
        intersection = gts - jnp.cumsum(fg_sorted)
        union = gts + jnp.cumsum((1.0 - fg_sorted) * valid_sorted)
        jaccard = 1.0 - intersection / jnp.maximum(union, 1e-12)
        grad = jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])
        relu_err = jnp.maximum(jnp.where(valid_sorted > 0, errors_sorted, 0.0),
                               0.0)
        return jnp.sum(relu_err * grad * valid_sorted)

    if per_image:
        return jnp.mean(jax.vmap(one_image)(logits, target))
    return one_image(logits, target)


def binary_xloss(logits, target, ignore_index=255):
    """Numerically-stable binary cross-entropy over non-ignored pixels
    (reference utils/lovasz_losses.py:128-150 StableBCELoss/binary_xloss)."""
    lg = logits.reshape(-1).astype(jnp.float32)
    tg = target.reshape(-1)
    valid = (tg != ignore_index).astype(jnp.float32)
    tgf = jnp.where(valid > 0, tg, 0).astype(jnp.float32)
    neg_abs = -jnp.abs(lg)
    loss = (jnp.maximum(lg, 0.0) - lg * tgf + jnp.log1p(jnp.exp(neg_abs)))
    return jnp.sum(loss * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def get_weights(target, num_classes: int):
    """Median-frequency class weights from a label batch (host-side numpy).

    Parity: reference utils/losses.py:13-22, generalized — upstream hardcodes
    7 classes (DeepScene), a documented defect (SURVEY.md §7).
    """
    import numpy as np

    t = np.asarray(target).reshape(-1)
    t = t[(t >= 0) & (t < num_classes)]
    classes, counts = np.unique(t, return_counts=True)
    cls_w = np.median(counts) / counts
    weights = np.ones(num_classes, np.float32)
    weights[classes] = cls_w
    return weights


# ---------------------------------------------------------------------------
# Registry — mirrors the names accepted by the reference's config["loss"]
# (reference train.py:30, README.md "Losses" section).
# ---------------------------------------------------------------------------

def _named(fn, **fixed):
    @functools.wraps(fn)
    def wrapped(logits, target, ignore_index=255, **kw):
        return fn(logits, target, ignore_index=ignore_index, **{**fixed, **kw})
    return wrapped


LOSSES = {
    "CrossEntropyLoss2d": _named(cross_entropy),
    "DiceLoss": _named(dice_loss),
    "FocalLoss": _named(focal_loss),
    "CE_DiceLoss": _named(ce_dice_loss),
    # the reference config name lands on the TPU-fast path by default; the
    # exact sort is an explicit opt-in (see lovasz_softmax_auto)
    "LovaszSoftmax": _named(lovasz_softmax_auto),
    "LovaszSoftmaxExact": _named(lovasz_softmax),
    "LovaszSoftmaxFast": _named(lovasz_softmax_binned),
}


def get_loss(name: str):
    if name not in LOSSES:
        raise KeyError(f"unknown loss {name!r}; available: {sorted(LOSSES)}")
    return LOSSES[name]
