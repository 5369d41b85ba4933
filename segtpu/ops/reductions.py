"""Reduction ops reformulated for the TPU vector unit.

``jnp.argmax`` lowers to XLA's variadic (value, index) reduce, which Mosaic
executes as a serialized two-operand reduction — profiled at 8 GB/s /
24 GFLOP/s on SegResNet's full-resolution prediction argmax (35 ms of a
244 ms train step for one (8, 769, 769, 19) tensor). Replacing it with two
plain monoid reduces (max, then min over an index mask) keeps the op on the
fast VPU reduction path; the compare/select fuse into the surrounding step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def fast_argmax(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """``jnp.argmax`` (first occurrence wins on ties) as max + masked
    min-over-iota — two monoid reduces instead of one variadic reduce.

    Matches ``jnp.argmax`` exactly for non-NaN inputs: positions equal to
    the running max select their index, everything else selects ``size``
    (>= any real index), and the min picks the earliest match.
    """
    if axis < 0:
        axis = x.ndim + axis
    size = x.shape[axis]
    m = jnp.max(x, axis=axis, keepdims=True)
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    return jnp.min(jnp.where(x == m, iota, jnp.int32(size)), axis=axis)


def packed_argmax(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """``jnp.argmax`` (first occurrence wins) as ONE ``reduce_max`` over an
    int32 packing of (monotone bfloat16 key, reversed index).

    Even :func:`fast_argmax`'s two monoid reduces run lane-starved when the
    reduced axis is the minor one with C=19 of 128 lanes occupied (measured
    19 ms/step at 14 GB/s on UNet's (8, 769, 769, 19) prediction tensor —
    the fused compare/select/iota runs inside BOTH reduce loops). Packing
    halves the reduce passes: the bfloat16 bit pattern is mapped to a
    sign-magnitude-monotone 16-bit key (negative floats: bitwise NOT;
    non-negative: set the sign bit), centered to signed int16 range, and
    packed with ``size-1-index`` in the low 16 bits, so one ``reduce_max``
    yields the max value AND its first index.

    EXACT vs ``jnp.argmax`` for 16-bit inputs (the bf16 activations of the
    train step) including -0.0 ties; wider dtypes are first rounded to
    bfloat16, so use :func:`fast_argmax` where fp32 tie-breaking matters.
    Assumes non-NaN input, like :func:`fast_argmax`.
    """
    if axis < 0:
        axis = x.ndim + axis
    size = x.shape[axis]
    b = jax.lax.bitcast_convert_type(
        x.astype(jnp.bfloat16), jnp.uint16).astype(jnp.int32)
    key = jnp.where(b >= 0x8000, 0xFFFF - b, b + 0x8000)
    key = jnp.where(b == 0x8000, 0x8000, key)  # -0.0 ties with +0.0
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    packed = (key - 0x8000) * 0x10000 + (size - 1 - iota)
    return (size - 1) - (jnp.max(packed, axis=axis) & 0xFFFF)


def onehot_first_max(x: jnp.ndarray) -> jnp.ndarray:
    """float32 one-hot of ``argmax(x, -1)`` (first occurrence wins) with NO
    reduction over the minor axis except one ``max``.

    Even :func:`fast_argmax`'s monoid ``reduce_min`` over the class axis runs
    at ~14 GB/s when C=19 occupies 19 of 128 lanes (measured 19 ms/step on a
    (8, 769, 769, 19) prediction tensor). The metric einsums consume a
    ONE-HOT of the argmax anyway, so build it directly: an equality mask
    against the row max, and a (C, C) triangular matmul (MXU) that counts
    maxima at positions <= c — the first maximum is where that count is 1.
    0/1 bf16 products with float32 accumulation are exact.
    """
    c = x.shape[-1]
    m = jnp.max(x, axis=-1, keepdims=True)
    eq = (x == m).astype(jnp.bfloat16)
    # upto[k, c] = 1 for k <= c: cum[..., c] = #maxima among classes 0..c
    upto = jnp.asarray(np.tril(np.ones((c, c), np.float32)).T, jnp.bfloat16)
    cum = jnp.einsum("...k,kc->...c", eq, upto,
                     preferred_element_type=jnp.float32)
    return ((cum == 1.0) & (eq > 0)).astype(jnp.float32)
