"""Bilinear / nearest resize as MXU matmuls.

The reference uses ``F.interpolate(..., align_corners=True|False)`` all over
its decoders (e.g. reference models/pspnet.py:35, models/deeplabv3_plus.py:326,
models/upernet.py:143). On TPU a separable interpolation is best expressed as
two small dense matmuls (one per spatial axis): each row of the interpolation
matrix has at most two non-zeros, XLA keeps the matrices in VMEM as constants,
and the contraction runs on the MXU — no gather units, no dynamic shapes.

All matrices are built with numpy at trace time (shapes are static under jit).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _linear_matrix_np(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """Row-stochastic (out_size, in_size) 1-D linear interpolation matrix.

    ``align_corners=True`` maps output i to input ``i*(in-1)/(out-1)``
    (torch semantics); ``False`` uses half-pixel centers with edge clamping
    (torch/cv2 INTER_LINEAR semantics).
    """
    if out_size == in_size:
        return np.eye(out_size, dtype=np.float32)
    if align_corners and out_size > 1:
        src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
        src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    lo = np.clip(lo, 0, in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = (src - lo).astype(np.float32)
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    rows = np.arange(out_size)
    np.add.at(mat, (rows, lo), 1.0 - frac)
    np.add.at(mat, (rows, hi), frac)
    return mat


@functools.lru_cache(maxsize=None)
def _nearest_matrix_np(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) one-hot nearest matrix, torch ``mode='nearest'``
    semantics: source index = floor(i * in/out)."""
    src = np.floor(np.arange(out_size, dtype=np.float64) * in_size / out_size)
    src = np.clip(src.astype(np.int64), 0, in_size - 1)
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    mat[np.arange(out_size), src] = 1.0
    return mat


def linear_resize_matrix(in_size: int, out_size: int, align_corners: bool = False):
    """Public accessor for the 1-D interpolation matrix (used by tests)."""
    return _linear_matrix_np(in_size, out_size, align_corners)


def _apply_separable(x: jnp.ndarray, mat_h: np.ndarray, mat_w: np.ndarray) -> jnp.ndarray:
    """Apply per-axis matrices to NHWC input via two MXU contractions."""
    dtype = x.dtype
    mh = jnp.asarray(mat_h, dtype=dtype)
    mw = jnp.asarray(mat_w, dtype=dtype)
    # (B,H,W,C) x (H',H) -> (B,H',W,C); then contract W. HIGHEST keeps fp32
    # interpolation exact (these matmuls are tiny next to the convs).
    hi = jax.lax.Precision.HIGHEST
    x = jnp.einsum("bhwc,Hh->bHwc", x, mh, precision=hi)
    x = jnp.einsum("bhwc,Ww->bhWc", x, mw, precision=hi)
    return x


def resize_bilinear(x: jnp.ndarray, size, align_corners: bool = False) -> jnp.ndarray:
    """Bilinear resize of an NHWC (or HWC) tensor to ``size=(H, W)``."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    out_h, out_w = int(size[0]), int(size[1])
    in_h, in_w = x.shape[1], x.shape[2]
    if (in_h, in_w) != (out_h, out_w):
        x = _apply_separable(
            x,
            _linear_matrix_np(in_h, out_h, align_corners),
            _linear_matrix_np(in_w, out_w, align_corners),
        )
    return x[0] if squeeze else x


def resize_nearest(x: jnp.ndarray, size) -> jnp.ndarray:
    """Nearest-neighbor resize of an NHWC (or HWC) tensor to ``size=(H, W)``."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    out_h, out_w = int(size[0]), int(size[1])
    in_h, in_w = x.shape[1], x.shape[2]
    if (in_h, in_w) != (out_h, out_w):
        x = _apply_separable(
            x,
            _nearest_matrix_np(in_h, out_h),
            _nearest_matrix_np(in_w, out_w),
        )
    return x[0] if squeeze else x
