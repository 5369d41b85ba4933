"""Pooling ops: torch-compatible max/avg pooling, adaptive average pooling as
an MXU matmul, and argmax pooling / max-unpooling for SegNet-style decoders.

The reference relies on ``nn.MaxPool2d(return_indices=True)`` +
``nn.MaxUnpool2d`` (reference models/segnet.py:62,106-119, models/enet.py:42),
which have no XLA primitive. TPU-native formulation:

* ``max_pool_argmax`` — for the 2x2/stride-2 windows the zoo actually uses,
  a reshape to (B, H/2, 2, W/2, 2, C) turns the window into a static axis;
  argmax over the 4 candidates is a pure VPU reduction.
* ``max_unpool`` — one-hot expand of the 2-bit index against the pooled
  values; a scatter-free, fully vectorized inverse.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from segtpu.ops.reductions import fast_argmax


def _pad_hw(x: jnp.ndarray, padding: int | tuple, value: float) -> jnp.ndarray:
    if isinstance(padding, int):
        padding = (padding, padding)
    ph, pw = padding
    if ph == 0 and pw == 0:
        return x
    return jnp.pad(
        x,
        ((0, 0), (ph, ph), (pw, pw), (0, 0)),
        mode="constant",
        constant_values=value,
    )


def max_pool(x, window=2, stride=None, padding=0, ceil_mode=False):
    """torch-style max pool on NHWC input (explicit -inf padding)."""
    if isinstance(window, int):
        window = (window, window)
    stride = window if stride is None else stride
    if isinstance(stride, int):
        stride = (stride, stride)
    # -inf (not finfo.min) so XLA recognizes reduce_window_max — the generic
    # reduce_window has no reverse-mode autodiff rule.
    neg = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    x = _pad_hw(x, padding, neg)
    if ceil_mode:
        # torch ceil_mode: allow a final partial window; pad the tail so the
        # window count matches ceil((size - k) / s) + 1.
        h, w = x.shape[1], x.shape[2]
        out_h = -(-(h - window[0]) // stride[0]) + 1
        out_w = -(-(w - window[1]) // stride[1]) + 1
        need_h = (out_h - 1) * stride[0] + window[0] - h
        need_w = (out_w - 1) * stride[1] + window[1] - w
        if need_h > 0 or need_w > 0:
            x = jnp.pad(
                x,
                ((0, 0), (0, max(need_h, 0)), (0, max(need_w, 0)), (0, 0)),
                mode="constant",
                constant_values=neg,
            )
    return jax.lax.reduce_window(
        x,
        neg,
        jax.lax.max,
        window_dimensions=(1, *window, 1),
        window_strides=(1, *stride, 1),
        padding="VALID",
    )


def avg_pool(x, window=2, stride=None, padding=0, count_include_pad=True):
    """torch-style average pool on NHWC input."""
    if isinstance(window, int):
        window = (window, window)
    stride = window if stride is None else stride
    if isinstance(stride, int):
        stride = (stride, stride)
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    summed = jax.lax.reduce_window(
        _pad_hw(xf, padding, 0.0),
        0.0,
        jax.lax.add,
        window_dimensions=(1, *window, 1),
        window_strides=(1, *stride, 1),
        padding="VALID",
    )
    if count_include_pad:
        out = summed / float(window[0] * window[1])
    else:
        ones = jnp.ones_like(xf[:1, :, :, :1])
        counts = jax.lax.reduce_window(
            _pad_hw(ones, padding, 0.0),
            0.0,
            jax.lax.add,
            window_dimensions=(1, *window, 1),
            window_strides=(1, *stride, 1),
            padding="VALID",
        )
        out = summed / counts
    return out.astype(orig_dtype)


@functools.lru_cache(maxsize=None)
def _adaptive_matrix_np(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) averaging matrix with torch adaptive_avg_pool2d bin edges:
    bin i covers [floor(i*in/out), ceil((i+1)*in/out))."""
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        lo = (i * in_size) // out_size
        hi = -(-((i + 1) * in_size) // out_size)
        mat[i, lo:hi] = 1.0 / (hi - lo)
    return mat


def adaptive_avg_pool(x: jnp.ndarray, output_size) -> jnp.ndarray:
    """torch ``adaptive_avg_pool2d`` on NHWC input, as two MXU matmuls.

    Used by the PSP pyramid (reference models/pspnet.py:22) and ASPP image
    pooling (reference models/deeplabv3_plus.py:270).
    """
    if isinstance(output_size, int):
        output_size = (output_size, output_size)
    out_h, out_w = output_size
    mh = jnp.asarray(_adaptive_matrix_np(x.shape[1], out_h), dtype=x.dtype)
    mw = jnp.asarray(_adaptive_matrix_np(x.shape[2], out_w), dtype=x.dtype)
    hi = jax.lax.Precision.HIGHEST
    x = jnp.einsum("bhwc,Hh->bHwc", x, mh, precision=hi)
    x = jnp.einsum("bhwc,Ww->bhWc", x, mw, precision=hi)
    return x


def adaptive_avg_pool_multi(x: jnp.ndarray, sizes) -> list:
    """``[adaptive_avg_pool(x, s) for s in sizes]`` with the input read ONCE.

    The PSP pyramid pools the same (B, H, W, C) map to 4 bin sizes; pooling
    H first per branch reads the full map 4 times (profiled at 3.2 ms/step
    of pure HBM traffic on PSPNet-R50 @769², B=8). Stacking the four H
    averaging matrices into one (sum(sizes), H) contraction reads the map
    once; the W stage then runs on (B, s, W, C) slivers. Same math, same
    bin edges (torch adaptive_avg_pool2d, reference models/pspnet.py:22).
    """
    sizes = [(s, s) if isinstance(s, int) else tuple(s) for s in sizes]
    h, w = x.shape[1], x.shape[2]
    mh = jnp.asarray(
        np.concatenate([_adaptive_matrix_np(h, sh) for sh, _ in sizes]),
        dtype=x.dtype)
    hi = jax.lax.Precision.HIGHEST
    xh = jnp.einsum("bhwc,Hh->bHwc", x, mh, precision=hi)
    outs, off = [], 0
    for sh, sw in sizes:
        mw = jnp.asarray(_adaptive_matrix_np(w, sw), dtype=x.dtype)
        outs.append(jnp.einsum("bhwc,Ww->bhWc", xh[:, off:off + sh], mw,
                               precision=hi))
        off += sh
    return outs


def max_pool_argmax(x: jnp.ndarray):
    """2x2/stride-2 max pool returning (pooled, idx).

    ``idx`` is int8 in [0, 4): the position of the max inside its 2x2 window
    (row-major). Odd trailing rows/cols are handled by -inf padding, matching
    the zoo's usage where inputs are even-sized.
    """
    b, h, w, c = x.shape
    neg = -jnp.inf
    ph, pw = h % 2, w % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), constant_values=neg)
        h, w = h + ph, w + pw
    windows = x.reshape(b, h // 2, 2, w // 2, 2, c)
    windows = windows.transpose(0, 1, 3, 5, 2, 4).reshape(b, h // 2, w // 2, c, 4)
    idx = fast_argmax(windows, axis=-1).astype(jnp.int8)
    pooled = jnp.max(windows, axis=-1)
    return pooled, idx


def max_unpool(y: jnp.ndarray, idx: jnp.ndarray, output_size=None) -> jnp.ndarray:
    """Inverse of :func:`max_pool_argmax`: place each pooled value at its
    argmax position within the corresponding 2x2 output window (zeros
    elsewhere). Scatter-free: one-hot(idx) * y, then window axes unfold."""
    b, h2, w2, c = y.shape
    onehot = jax.nn.one_hot(idx.astype(jnp.int32), 4, dtype=y.dtype)
    expanded = y[..., None] * onehot  # (B, H/2, W/2, C, 4)
    expanded = expanded.reshape(b, h2, w2, c, 2, 2).transpose(0, 1, 4, 2, 5, 3)
    out = expanded.reshape(b, h2 * 2, w2 * 2, c)
    if output_size is not None:
        out = out[:, : output_size[0], : output_size[1], :]
    return out


def max_pool_argmax_flat(x: jnp.ndarray, window: int = 3, stride: int = 2,
                         padding: int = 1):
    """torch ``max_pool2d(..., return_indices=True)`` semantics for
    OVERLAPPING windows: returns (pooled, idx) where ``idx`` is the FLAT
    row-major position (h*W + w) of each window's max in the unpadded input
    plane, per channel — exactly what ``F.max_unpool2d`` consumes
    (SegResNet's stem pool, reference models/segnet.py:209,246-253).

    Scatter-free: one strided slice per window tap, running (val, idx) max
    with strictly-greater updates so ties resolve to the first row-major
    tap, matching torch's scan order.
    """
    b, h, w, c = x.shape
    neg = jnp.asarray(-jnp.inf, x.dtype)
    xp = jnp.pad(x, ((0, 0), (padding, padding + window),
                     (padding, padding + window), (0, 0)),
                 constant_values=neg)
    ho = (h + 2 * padding - window) // stride + 1
    wo = (w + 2 * padding - window) // stride + 1
    rows = jnp.arange(ho) * stride - padding  # top-left of each window
    cols = jnp.arange(wo) * stride - padding
    best_val = jnp.full((b, ho, wo, c), neg, x.dtype)
    best_idx = jnp.zeros((b, ho, wo, c), jnp.int32)
    for dh in range(window):
        for dw in range(window):
            v = jax.lax.slice(
                xp, (0, dh, dw, 0),
                (b, dh + (ho - 1) * stride + 1,
                 dw + (wo - 1) * stride + 1, c),
                (1, stride, stride, 1))
            flat = ((rows + dh)[:, None] * w + (cols + dw)[None, :])
            flat = flat[None, :, :, None].astype(jnp.int32)
            better = v > best_val
            best_val = jnp.where(better, v, best_val)
            best_idx = jnp.where(better, flat, best_idx)
    return best_val, best_idx


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def max_unpool_flat(y: jnp.ndarray, idx: jnp.ndarray, output_hw,
                    input_hw=None, window: int = 3, stride: int = 2,
                    padding: int = 1) -> jnp.ndarray:
    """torch ``F.max_unpool2d``: place each value of ``y`` at its flat
    ``idx`` position (row-major in the pool's (h, w) input plane) in a
    zeros (B, OH*OW) canvas, per batch/channel — SegResNet's decoder
    epilogue (reference models/segnet.py:209,246-253).

    Scatter-free AND dilation-free (round 5): ``idx`` came from a
    (window, stride, padding) pool, so a target position ``y = s*i + d``
    (residue ``d`` mod the stride) can only be claimed through the taps
    ``dh ≡ d + p (mod s)``, each by the pixel shifted ``(d+p-dh)/s`` rows.
    Per residue pair the claimed values form a DENSE plane at pooled
    resolution — a handful of compare/select ops over unshifted/shifted
    views of (y, idx) — and one stack+reshape interleaves the s×s residue
    planes into the input plane. No strided writes at all: the previous
    form placed each tap with interior-dilated ``lax.pad`` shifts, which
    emitted ~125 ms/step of 23-37 GB/s mostly-zero writes inside
    SegResNet's train step (and the scatter form before it held the step
    at 1117 ms, 2.6% MFU @769² bs8).

    Duplicate indices (one input position winning several overlapping
    windows) can carry UNEQUAL values here — the scattered tensor is the
    decoder output, not the pooled maxima. Within a residue the candidate
    selects are applied in ascending claiming-pixel order (later select
    overwrites), reproducing torch-CPU's last-write-wins deterministically;
    torch-CUDA is racy on those pixels. Out-of-plane taps (edge windows'
    padded taps, whose flat values alias neighbouring rows) can never
    match a real argmax: the aliased position lies outside the claiming
    window (column wrap) or beyond ``h*w`` (row overflow).

    ``input_hw`` (the pool's input plane size) is REQUIRED: the minimal
    plane consistent with ``idx``'s grid is off by one for even-sized pool
    inputs (e.g. reconstructs 15 for an actual 16), and ``idx`` values are
    flat offsets in the TRUE plane — a wrong width silently maps every
    value past row 0 to the wrong position.
    """
    b, ho, wo, c = y.shape
    oh, ow = output_hw
    if input_hw is None:
        raise ValueError(
            "max_unpool_flat requires input_hw (the pool's input plane "
            "size): it cannot be reconstructed from idx's grid — the "
            "minimal consistent plane is off by one for even-sized inputs, "
            "which silently corrupts the flat-index mapping.")
    h, w = input_hw
    s, p = stride, padding
    hq, wq = -(-h // s), -(-w // s)

    def shifts(d):
        """Claiming-pixel shifts for residue ``d``: target s*i+d is written
        by pixel i+t through tap dh = d + p - s*t (ascending t = ascending
        pixel = ascending torch scan priority)."""
        return sorted((d + p - dh) // s
                      for dh in range(window) if (d + p - dh) % s == 0)

    all_t = [t for d in range(s) for t in shifts(d)]
    lo = max(0, -min(all_t))
    hi = max(max(0, max(all_t)) + max(hq, wq) - min(ho, wo), 0)
    yp = jnp.pad(y, ((0, 0), (lo, hi), (lo, hi), (0, 0)))
    ip = jnp.pad(idx, ((0, 0), (lo, hi), (lo, hi), (0, 0)),
                 constant_values=-1)  # never matches a flat target (>= 0)

    quads = []
    for dy in range(s):
        trow = (s * jnp.arange(hq) + dy).astype(jnp.int32)
        row = []
        for dx in range(s):
            tcol = (s * jnp.arange(wq) + dx).astype(jnp.int32)
            # targets past the plane edge get flat >= h*w: no idx matches,
            # and the final slice crops those rows/cols anyway
            tflat = (trow[:, None] * w + tcol[None, :])[None, :, :, None]
            acc = jnp.zeros((b, hq, wq, c), y.dtype)
            for tr in shifts(dy):
                for tc in shifts(dx):
                    vv = jax.lax.slice(
                        yp, (0, tr + lo, tc + lo, 0),
                        (b, tr + lo + hq, tc + lo + wq, c))
                    ii = jax.lax.slice(
                        ip, (0, tr + lo, tc + lo, 0),
                        (b, tr + lo + hq, tc + lo + wq, c))
                    acc = jnp.where(ii == tflat, vv, acc)
            row.append(acc)
        quads.append(jnp.stack(row, axis=3))  # (B, hq, wq, s, C)
    plane = jnp.stack(quads, axis=2)  # (B, hq, s, wq, s, C)
    plane = plane.reshape(b, hq * s, wq * s, c)[:, :h, :w]
    flat_plane = plane.reshape(b, h * w, c)
    out = jnp.pad(flat_plane, ((0, 0), (0, oh * ow - h * w), (0, 0)))
    return out.reshape(b, oh, ow, c)


def _max_unpool_flat_fwd(y, idx, output_hw, input_hw, window, stride, padding):
    out = max_unpool_flat(y, idx, output_hw, input_hw, window, stride, padding)
    return out, idx


def _max_unpool_flat_bwd(output_hw, input_hw, window, stride, padding,
                         idx, g):
    """torch's unpool backward: EVERY pooled pixel reads the cotangent at
    its flat position — duplicated indices all receive it, even though the
    forward's last-write-wins kept only one of their values. That fwd/bwd
    inconsistency is torch's own (max_unpool2d backward is an unconditional
    gather); reproduced for training-dynamics parity.

    Gather-free (round 5): ``take_along_axis`` over the (B, OH*OW, C) plane
    is a per-lane gather along a non-minor axis — measured 242 ms/step at
    1 GB/s inside SegResNet's train step (41% of the whole step). Instead,
    mirror the forward's tap decomposition: per tap (dh, dw) the candidate
    cotangent is a STRIDED SLICE of the (padded) gradient plane at the
    tap's positions, claimed by the same ``idx == flat`` compare. Masks are
    exclusive across taps at a fixed pixel (two taps collide only if
    ``(dh-dh')*w == dw'-dw``, impossible for ``|dw'-dw| < w``; out-of-plane
    taps' aliased flat values name positions outside the pixel's window and
    row overflows exceed ``h*w``, so they never match a real argmax), so a
    masked SUM reproduces the gather exactly — 9 compare/slice/select ops
    that XLA fuses, zero gathers.
    """
    b, ho, wo, c = idx.shape
    oh, ow = output_hw
    h, w = input_hw
    # idx values live in [0, h*w): the forward's padded tail rows of the
    # (OH*OW) canvas are never read back.
    g_plane = g.reshape(b, oh * ow, c)[:, :h * w].reshape(b, h, w, c)
    # Pad once so every tap's strided read window is in-bounds; the padding
    # region only feeds out-of-plane taps, whose masks never fire.
    hi_h = max(0, (ho - 1) * stride - padding + window - h)
    hi_w = max(0, (wo - 1) * stride - padding + window - w)
    gp = jax.lax.pad(g_plane, jnp.asarray(0, g.dtype),
                     ((0, 0, 0), (padding, hi_h, 0), (padding, hi_w, 0),
                      (0, 0, 0)))
    rows = jnp.arange(ho) * stride - padding
    cols = jnp.arange(wo) * stride - padding
    gy = jnp.zeros((b, ho, wo, c), g.dtype)
    for dh in range(window):
        for dw in range(window):
            flat = ((rows + dh)[:, None] * w + (cols + dw)[None, :])
            m = idx == flat[None, :, :, None].astype(jnp.int32)
            v = jax.lax.slice(
                gp, (0, dh, dw, 0),
                (b, dh + (ho - 1) * stride + 1, dw + (wo - 1) * stride + 1, c),
                (1, stride, stride, 1))
            gy = gy + jnp.where(m, v, jnp.asarray(0, g.dtype))
    return gy, np.zeros(idx.shape, jax.dtypes.float0)


max_unpool_flat.defvjp(_max_unpool_flat_fwd, _max_unpool_flat_bwd)
