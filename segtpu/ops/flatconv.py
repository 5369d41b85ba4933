"""Flat-row Pallas backward kernels for stride-1 NHWC convs.

Target: the round-3 profile's residual conv slack — stride-1 small-C 3x3
backwards that XLA's conv emitter runs at 54-120 TFLOP/s and well under HBM
bandwidth (PSPNet stem_conv2/3 backward, the 512->19 classifier backward;
README "profiled roofline"). The stem-wgrad spike (ops/conv_wgrad.py)
proved a Pallas contraction beats the emitter 9x but died on its XLA-side
layout preamble; this design has NO preamble by construction:

* **Flat rows**: x (N,H,W,C) and dy (N,H,W,O) are viewed as (N*H*W, C/O) —
  a contiguous (free) reshape. For a stride-1 dilation-d conv, the tap
  (a, b) pairs x row ``r + (a*d-p)*W + (b*d-p)`` with dy row ``r``: every
  tap is a ROW-OFFSET slice of the flat array.
* **2-D blocks**: the kernels tile the row axis; blocks are natively 2-D so
  Mosaic's no-reshape-under-128-lanes restriction never applies, any C/O
  works (19, 64, 512, ...), and all VMEM stores are full-lane rows (the
  partial-lane store hazard that broke conv_wgrad on hardware can't occur).
* **Halo via neighbor blocks**: each grid step also receives its previous /
  next row-block (clamped at the edges) and assembles a (R + 2*HP, C)
  window in scratch — no cross-step carry, no sequential dependence.
* **Boundary masks, NaN-safe**: W-edge wraps, H/image crossings, and the
  ragged last block are killed by per-row ``jnp.where`` masks built from
  streamed h/w index vectors + an in-kernel absolute-row iota (select, not
  multiply, so OOB-block garbage — even NaN — cannot leak in).

``flat_conv`` is a ``jax.custom_vjp`` stride-1 conv: forward = XLA's conv
(keeps its input fusions), backward = these kernels.

MEASURED OUTCOME (round 3, v5e): correct on hardware (wgrad rel_err ~4e-6)
but NOT deployed — isolated timings at the target shapes are 0.29-1.21x of
XLA (stem_conv2 wgrad 12.4 vs 4.4 ms; classifier wgrad the one isolated
win, 2.57 vs 3.10 ms), and the deciding comparison is worse than the
isolated one suggests: the profile attributes only 1.85 ms to the WHOLE
in-step classifier backward, i.e. in-step XLA (with input fusions) is ~3x
faster than the same convs run standalone. Two structural costs bound this
design: the Mosaic scoped-VMEM stack (the tap loop's ~k^2 masked (R, C)
temporaries forced R down to 1024, shrinking the MXU contraction), and the
3x halo re-read of the row stream. The kernels are kept as a tested,
general pattern (any C/O, dilation, kernel size) and as the measured
record; see README "profiled roofline".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _row_tile(c_in: int, c_out: int) -> int:
    """Row-tile size. The binding constraint is the Mosaic scoped-VMEM
    stack: the tap loop materializes ~k^2 masked (R, C) operands, so R
    must stay small enough that blocks + scratch + those live values fit
    the 16MB limit (R=4096 at C=64 hit a 39MB stack)."""
    width = max(c_in, c_out)
    if width <= 128:
        return 1024
    if width <= 256:
        return 1024
    return 512


def _geometry(kernel_hw, padding, dilation, W):
    kh, kw = kernel_hw
    p = padding
    d = dilation
    # tap (a, b) -> flat row offset; HP = max |offset|, the halo extent
    offs = [((a * d - p) * W + (b * d - p)) for a in range(kh)
            for b in range(kw)]
    hp = max(max(offs), -min(offs), 0)
    return kh, kw, p, d, hp


def _make_wgrad_kernel(kh, kw, p, d, W, H, NHW, R, HP):
    def kernel(xp_ref, xc_ref, xn_ref, dy_ref, out_ref, xs_ref):
        """xp/xc/xn: prev/cur/next (R, C) x row-blocks; dy: (R, O); out:
        (kh*kw, C, O) fp32 accumulated across the whole grid; xs: scratch
        (R + 2*HP, C) halo window. Per-image h/w indices are computed
        in-kernel from the absolute-row iota (streaming them as (R, 1)
        blocks cost 8MB of lane-padded VMEM and OOM'd the compiler).

        Masks sit on the GARBAGE-CARRYING side (select, not multiply):
        halo/OOB garbage — possibly NaN — lives in the x window (per-tap
        ``valid`` select) and in dy's ragged tail (``cov`` select, once
        per tile); a mask on only one side would let NaN*0 through."""
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        if HP:
            xs_ref[0:HP] = xp_ref[R - HP:R]
            xs_ref[HP:HP + R] = xc_ref[:]
            xs_ref[HP + R:] = xn_ref[0:HP]
        else:
            xs_ref[:] = xc_ref[:]

        r_abs = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0) + i * R
        cov = r_abs < NHW
        wz = jax.lax.rem(r_abs, W)
        hz = jax.lax.rem(jax.lax.div(r_abs, W), H)
        dy = dy_ref[:]
        dym = jnp.where(cov, dy, jnp.zeros_like(dy))
        for a in range(kh):
            for b in range(kw):
                dh = a * d - p
                dw = b * d - p
                valid = jnp.logical_and(
                    cov,
                    jnp.logical_and(
                        jnp.logical_and(hz + dh >= 0, hz + dh < H),
                        jnp.logical_and(wz + dw >= 0, wz + dw < W)))
                off = HP + dh * W + dw
                xs = xs_ref[off:off + R]
                xm = jnp.where(valid, xs, jnp.zeros_like(xs))
                out_ref[a * kw + b] += jax.lax.dot_general(
                    xm, dym, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

    return kernel


def _make_dgrad_kernel(kh, kw, p, d, W, H, NHW, R, HP):
    def kernel(dp_ref, dc_ref, dn_ref, w_ref, out_ref, ds_ref):
        """dp/dc/dn: prev/cur/next (R, O) dy row-blocks; w: (kh*kw, O, C)
        taps; out: (R, C) dx rows; ds: scratch (R + 2*HP, O). h/w indices
        of the OUTPUT rows r are computed in-kernel (see wgrad kernel)."""
        if HP:
            ds_ref[0:HP] = dp_ref[R - HP:R]
            ds_ref[HP:HP + R] = dc_ref[:]
            ds_ref[HP + R:] = dn_ref[0:HP]
        else:
            ds_ref[:] = dc_ref[:]

        i = pl.program_id(0)
        r_abs = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0) + i * R
        wz = jax.lax.rem(r_abs, W)
        hz = jax.lax.rem(jax.lax.div(r_abs, W), H)
        acc = jnp.zeros(out_ref.shape, jnp.float32)
        for a in range(kh):
            for b in range(kw):
                dh = a * d - p
                dw = b * d - p
                # dx[r] receives dy[r - off] * W[a,b] iff the forward tap
                # from output position r-off actually read input r: the
                # un-wrapped shift needs h(r)-dh and w(r)-dw in range.
                valid = jnp.logical_and(
                    jnp.logical_and(hz - dh >= 0, hz - dh < H),
                    jnp.logical_and(wz - dw >= 0, wz - dw < W))
                off = HP - (dh * W + dw)
                dys = ds_ref[off:off + R]
                dym = jnp.where(valid, dys, jnp.zeros_like(dys))
                acc += jax.lax.dot_general(
                    dym, w_ref[a * kw + b],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        out_ref[:] = acc.astype(out_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("kernel_hw", "padding",
                                             "dilation", "interpret"))
def flat_conv_wgrad(x, dy, kernel_hw=(3, 3), padding=1, dilation=1,
                    interpret=False):
    """dL/dW (HWIO (kh, kw, C, O), fp32) of a stride-1 conv, flat-row tiled.

    ``x``: (N, H, W, C), ``dy``: (N, H, W, O) — same spatial size (stride 1,
    any symmetric padding/dilation with (k-1)*d == 2*padding)."""
    n, h, w, c = x.shape
    o = dy.shape[-1]
    kh, kw, p, d, hp = _geometry(kernel_hw, padding, dilation, w)
    nhw = n * h * w
    R = _row_tile(c, o)
    x2 = x.reshape(nhw, c).astype(jnp.bfloat16)
    dy2 = dy.reshape(nhw, o).astype(jnp.bfloat16)
    G = -(-nhw // R)
    prev_m = lambda i: (jnp.maximum(i - 1, 0), 0)
    cur_m = lambda i: (i, 0)
    next_m = lambda i: (jnp.minimum(i + 1, G - 1), 0)
    out = pl.pallas_call(
        _make_wgrad_kernel(kh, kw, p, d, w, h, nhw, R, hp),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((R, c), prev_m, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, c), cur_m, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, c), next_m, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, o), cur_m, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((kh * kw, c, o), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kh * kw, c, o), jnp.float32),
        scratch_shapes=[pltpu.VMEM((R + 2 * hp, c), jnp.bfloat16)],
        interpret=interpret,
    )(x2, x2, x2, dy2)
    return out.reshape(kh, kw, c, o)


@functools.partial(jax.jit, static_argnames=("kernel_hw", "padding",
                                             "dilation", "interpret"))
def flat_conv_dgrad(dy, w_hwio, kernel_hw=(3, 3), padding=1, dilation=1,
                    interpret=False):
    """dL/dx (N, H, W, C) of a stride-1 conv, flat-row tiled."""
    n, h, w, o = dy.shape
    kh, kw, p, d, hp = _geometry(kernel_hw, padding, dilation, w)
    c = w_hwio.shape[2]
    nhw = n * h * w
    R = _row_tile(c, o)
    dy2 = dy.reshape(nhw, o).astype(jnp.bfloat16)
    wt = w_hwio.reshape(kh * kw, c, o).transpose(0, 2, 1)  # taps, O, C
    wt = wt.astype(jnp.bfloat16)
    G = -(-nhw // R)
    prev_m = lambda i: (jnp.maximum(i - 1, 0), 0)
    cur_m = lambda i: (i, 0)
    next_m = lambda i: (jnp.minimum(i + 1, G - 1), 0)
    out = pl.pallas_call(
        _make_dgrad_kernel(kh, kw, p, d, w, h, nhw, R, hp),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((R, o), prev_m, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, o), cur_m, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, o), next_m, memory_space=pltpu.VMEM),
            pl.BlockSpec((kh * kw, o, c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, c), cur_m, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nhw, c), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((R + 2 * hp, o), jnp.bfloat16)],
        interpret=interpret,
    )(dy2, dy2, dy2, wt)
    return out.reshape(n, h, w, c)


# ---------------------------------------------------------------------------
# custom_vjp conv: XLA forward (keeps input fusions), flat-row backward.

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def flat_conv(x, w_hwio, kernel_hw, padding, dilation):
    """Stride-1 NHWC/HWIO conv whose backward is the flat-row Pallas pair.

    Requires (k-1)*dilation == 2*padding (SAME-size output) so x and dy
    share the flat-row geometry. Groups unsupported."""
    p = padding
    d = dilation
    return jax.lax.conv_general_dilated(
        x, w_hwio.astype(x.dtype), (1, 1), ((p, p), (p, p)),
        rhs_dilation=(d, d), dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _fc_fwd(x, w_hwio, kernel_hw, padding, dilation):
    return flat_conv(x, w_hwio, kernel_hw, padding, dilation), (x, w_hwio)


def _fc_bwd(kernel_hw, padding, dilation, res, g):
    x, w_hwio = res
    dw = flat_conv_wgrad(x, g, kernel_hw=kernel_hw, padding=padding,
                         dilation=dilation).astype(w_hwio.dtype)
    dx = flat_conv_dgrad(g, w_hwio, kernel_hw=kernel_hw, padding=padding,
                         dilation=dilation).astype(x.dtype)
    return dx, dw


flat_conv.defvjp(_fc_fwd, _fc_bwd)
