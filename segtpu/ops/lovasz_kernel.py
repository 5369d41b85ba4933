"""Pallas TPU kernel for the binned-Lovász threshold histograms.

The binned Lovász-Softmax (segtpu/losses.py::lovasz_softmax_binned) needs,
for every class c and error threshold t_k (with err = |onehot(y) - p| on
valid pixels):

    cum_fg[c,k]  = sum_p fg[p,c]    * (err[p,c] >= t_k)
    cum_all[c,k] = sum_p valid[p]   * (err[p,c] >= t_k)
    cum_err[c,k] = sum_p err[p,c]   * (err[p,c] >= t_k)

The XLA formulation (broadcast compare + einsum over a logical (P, C, K)
tensor) measured ~240 ms/step at Cityscapes training shapes. This kernel
makes one pass over P tiles with everything derived IN KERNEL from
``probs`` (P, C) and ``target`` (P, 1): the one-hot, the validity mask, the
errors, and the (T, C, K) indicator all live only in VMEM/registers — no
host-side one-hot, broadcast, or pad copies (those cost ~1.4 GB HBM at
batch-8 769^2 and OOM'd the step).

Backward is the mirror pass: d probs[p,c] = -sign(fg - p) * valid *
sum_k (err >= t_k) * g_cum_err[c,k], with the indicator treated as a
constant under autodiff (the exact Lovász detaches its sort permutation the
same way). Wired as a jax.custom_vjp.

Grid is 1-D over P tiles; TPU grids execute sequentially per core, so "+="
accumulation into a single output block is well-defined. The ragged tail is
masked in-kernel from the static P.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_P = 512

# Tests flip this to run the kernels in interpreter mode on CPU.
INTERPRET = False


def _edges(bins: int) -> jnp.ndarray:
    """Descending thresholds 1 -> 1/bins (matches lovasz_softmax_binned)."""
    k = jax.lax.broadcasted_iota(jnp.int32, (1, bins), 1).astype(jnp.float32)
    return 1.0 - k / bins  # (1, K)


def _derive(probs, target, row_ok, num_classes, ignore_index):
    """In-kernel fg / valid / errors from the raw inputs."""
    classes = jax.lax.broadcasted_iota(jnp.int32, probs.shape, 1)
    in_range = (target != ignore_index) & (target >= 0) & (target < num_classes)
    valid = (in_range & row_ok).astype(jnp.float32)  # (T, 1)
    fg = (classes == target).astype(jnp.float32) * valid  # (T, C)
    errors = jnp.abs(fg - probs) * valid
    return fg, valid, errors


def _fwd_kernel(probs_ref, target_ref, cumfg_ref, cumall_ref, cumerr_ref, *,
                bins: int, ignore_index: int, total_p: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        cumfg_ref[:] = jnp.zeros_like(cumfg_ref)
        cumall_ref[:] = jnp.zeros_like(cumall_ref)
        cumerr_ref[:] = jnp.zeros_like(cumerr_ref)

    probs = probs_ref[:]            # (T, C)
    target = target_ref[:]          # (T, 1) int32
    t, c_dim = probs.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0) + i * t
    row_ok = rows < total_p
    fg, valid, err = _derive(probs, target, row_ok, c_dim, ignore_index)
    edges = _edges(bins)  # (1, K)
    # Per-class 2-D tiles: (T, 1) vs (1, K) -> (T, K) rides the native
    # (sublane, lane) layout; a fused 3-D (T, C, K) tensor tiles poorly.
    for c in range(c_dim):
        ge = (err[:, c:c + 1] >= edges).astype(jnp.float32)  # (T, K)
        cumfg_ref[c:c + 1, :] += jnp.sum(ge * fg[:, c:c + 1], axis=0,
                                         keepdims=True)
        cumall_ref[c:c + 1, :] += jnp.sum(ge * valid, axis=0, keepdims=True)
        cumerr_ref[c:c + 1, :] += jnp.sum(ge * err[:, c:c + 1], axis=0,
                                          keepdims=True)


def _bwd_kernel(probs_ref, target_ref, gcum_ref, dprobs_ref, *, bins: int,
                ignore_index: int, total_p: int):
    i = pl.program_id(0)
    probs = probs_ref[:]
    target = target_ref[:]
    t = probs.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0) + i * t
    row_ok = rows < total_p
    c_dim = probs.shape[1]
    fg, valid, err = _derive(probs, target, row_ok, c_dim, ignore_index)
    edges = _edges(bins)
    g = gcum_ref[:]  # (C, K)
    cols = []
    for c in range(c_dim):
        ge = (err[:, c:c + 1] >= edges).astype(jnp.float32)  # (T, K)
        cols.append(jnp.sum(ge * g[c:c + 1, :], axis=1, keepdims=True))
    derr = jnp.concatenate(cols, axis=1)  # (T, C)
    # err = |fg - probs| * valid  =>  d err / d probs = -sign(fg - probs)*valid
    dprobs_ref[:] = derr * (-jnp.sign(fg - probs)) * valid


def _pad_p(x, tile):
    rem = (-x.shape[0]) % tile
    if rem:
        x = jnp.pad(x, ((0, rem),) + ((0, 0),) * (x.ndim - 1))
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def lovasz_histograms(probs, target, bins: int = 128,
                      ignore_index: int = 255):
    """(cum_fg, cum_all, cum_err), each (C, bins), from softmax probabilities
    (P, C) float32 and integer labels (P,). Gradient flows to ``probs``."""
    return _run_fwd(probs, target, bins, ignore_index)


def _run_fwd(probs, target, bins, ignore_index):
    p, c = probs.shape
    probs_p = _pad_p(probs.astype(jnp.float32), _TILE_P)
    target_p = _pad_p(target.reshape(-1, 1).astype(jnp.int32), _TILE_P)
    grid = probs_p.shape[0] // _TILE_P

    kernel = functools.partial(_fwd_kernel, bins=bins,
                               ignore_index=ignore_index, total_p=p)
    out_spec = pl.BlockSpec((c, bins), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    return tuple(pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((_TILE_P, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((_TILE_P, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[out_spec, out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((c, bins), jnp.float32)] * 3,
        interpret=INTERPRET,
    )(probs_p, target_p))


def _vjp_fwd(probs, target, bins, ignore_index):
    return _run_fwd(probs, target, bins, ignore_index), (probs, target)


def _vjp_bwd(bins, ignore_index, residuals, gouts):
    probs, target = residuals
    _, _, g_cumerr = gouts
    p, c = probs.shape
    probs_p = _pad_p(probs.astype(jnp.float32), _TILE_P)
    target_p = _pad_p(target.reshape(-1, 1).astype(jnp.int32), _TILE_P)
    grid = probs_p.shape[0] // _TILE_P
    kernel = functools.partial(_bwd_kernel, bins=bins,
                               ignore_index=ignore_index, total_p=p)
    dprobs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((_TILE_P, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((_TILE_P, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((c, bins), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_TILE_P, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((probs_p.shape[0], c), jnp.float32),
        interpret=INTERPRET,
    )(probs_p, target_p, jnp.asarray(g_cumerr, jnp.float32))
    return dprobs[:p], None


lovasz_histograms.defvjp(_vjp_fwd, _vjp_bwd)


def histograms_reference(probs, target, bins: int = 128,
                         ignore_index: int = 255):
    """Pure-XLA equivalent (used off-TPU and by tests)."""
    p, c = probs.shape
    tflat = target.reshape(-1)
    valid = ((tflat != ignore_index) & (tflat >= 0)
             & (tflat < c)).astype(jnp.float32)
    safe_t = jnp.where(valid > 0, tflat, 0).astype(jnp.int32)
    fg = jax.nn.one_hot(safe_t, c, dtype=jnp.float32) * valid[:, None]
    errors = jnp.abs(fg - probs.astype(jnp.float32)) * valid[:, None]

    k = jnp.arange(bins, dtype=jnp.float32)
    edges = 1.0 - k / bins
    ge = jax.lax.stop_gradient(
        (errors[:, :, None] >= edges[None, None, :]).astype(jnp.float32))
    validc = valid[:, None] * jnp.ones_like(fg)
    cum_fg = jnp.einsum("pck,pc->ck", ge, fg)
    cum_all = jnp.einsum("pck,pc->ck", ge, validc)
    cum_err = jnp.einsum("pck,pc->ck", ge, errors)
    return cum_fg, cum_all, cum_err
