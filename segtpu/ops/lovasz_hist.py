"""Threshold histograms for the binned Lovász-Softmax, as MXU matmuls.

The binned loss (segtpu/losses.py::lovasz_softmax_binned) needs, for every
class c and descending error threshold t_k = 1 - k/bins (with
err = |onehot(y) - p| on valid pixels):

    cum_fg[c,k]  = sum_p fg[p,c]  * (err[p,c] >= t_k)
    cum_all[c,k] = sum_p valid[p] * (err[p,c] >= t_k)
    cum_err[c,k] = sum_p err[p,c] * (err[p,c] >= t_k)

Two formulations, measured on a v5e at Cityscapes training shapes
(P = 8*769^2, C = 19, full PSPNet train step / isolated grad evaluation):

* ``histograms_compare`` (the default): broadcast ``err >= t_k`` compare +
  einsum over the (P, C, K) indicator. 442 ms/step in the full train step,
  171 ms isolated.
* ``histograms_onehot``: bucketize each error once
  (err >= t_k  <=>  k >= kmin := ceil((1-err)*bins)), histogram with a
  one-hot MXU einsum, prefix-sum the K axis. 68 ms isolated — 2.5x the
  compare form — but 492 ms in the full step: materializing the (P, C, K)
  one-hot costs HBM writes XLA cannot fuse away, while the compare
  indicator fuses into its consuming einsum. Kept as a tested alternative
  (isolated/eval use, or if a future XLA fuses the one-hot).

A hand-written Pallas accumulation kernel measured 578 ms/step — both XLA
forms beat it; removed (see git history). Everything stays float32:
measured no slower than bf16 operands here, and the compare/onehot forms
agree bit-comparably.

Like the exact Lovász (whose sort permutation is detached in the reference,
utils/lovasz_losses.py:153-199), the threshold indicator is a constant under
autodiff: gradients flow through the summed ``err`` values only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _fg_valid_errors(probs, target, num_classes: int, ignore_index: int):
    tflat = target.reshape(-1)
    valid = ((tflat != ignore_index) & (tflat >= 0)
             & (tflat < num_classes)).astype(jnp.float32)
    safe_t = jnp.where(valid > 0, tflat, 0).astype(jnp.int32)
    fg = jax.nn.one_hot(safe_t, num_classes, dtype=jnp.float32) * valid[:, None]
    errors = jnp.abs(fg - probs.astype(jnp.float32)) * valid[:, None]
    return fg, valid, errors


def histograms_onehot(probs, target, bins: int = 128, ignore_index: int = 255):
    """(cum_fg, cum_all, cum_err), each (C, bins), from softmax probabilities
    (P, C) and integer labels (P,). Gradient flows to ``probs`` via the
    error sums; the bin assignment is detached."""
    p, c = probs.shape
    fg, valid, errors = _fg_valid_errors(probs, target, c, ignore_index)
    # err >= t_k  <=>  k >= ceil((1-err)*bins). Invalid pixels have err = 0,
    # so kmin = bins, which one_hot maps to an all-zero row (excluded) — the
    # same exclusion the compare form gets from err 0 < t_{K-1} = 1/bins.
    kmin = jnp.ceil(
        (1.0 - jax.lax.stop_gradient(errors)) * bins).astype(jnp.int32)
    oh = jax.nn.one_hot(kmin, bins, dtype=jnp.float32)            # (P, C, K)
    w = jnp.stack([fg, valid[:, None] * jnp.ones_like(fg), errors],
                  axis=-1)                                        # (P, C, 3)
    hist = jnp.einsum("pck,pcx->cxk", oh, w,
                      preferred_element_type=jnp.float32)         # (C, 3, K)
    cum = jnp.cumsum(hist, axis=-1)
    return cum[:, 0, :], cum[:, 1, :], cum[:, 2, :]


def histograms_compare(probs, target, bins: int = 128,
                       ignore_index: int = 255):
    """Broadcast-compare formulation (float32 throughout) — the default:
    fastest inside the full train step (see module docstring) and the
    correctness oracle for the one-hot variant."""
    p, c = probs.shape
    fg, valid, errors = _fg_valid_errors(probs, target, c, ignore_index)

    k = jnp.arange(bins, dtype=jnp.float32)
    edges = 1.0 - k / bins
    ge = jax.lax.stop_gradient(
        (errors[:, :, None] >= edges[None, None, :]).astype(jnp.float32))
    validc = valid[:, None] * jnp.ones_like(fg)
    cum_fg = jnp.einsum("pck,pc->ck", ge, fg)
    cum_all = jnp.einsum("pck,pc->ck", ge, validc)
    cum_err = jnp.einsum("pck,pc->ck", ge, errors)
    return cum_fg, cum_all, cum_err
