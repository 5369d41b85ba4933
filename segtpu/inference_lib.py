"""Multi-scale / sliding-window inference.

Parity target: reference inference.py — multi_scale_predict (:61-79:
scipy zoom per scale, bilinear align_corners=True upsample, optional
flip-averaging, mean over scales) and sliding_predict (:26-58: tile =
size/2.5, overlap 1/3, count-normalized logit accumulation).

TPU-first reformulation of the sliding mode — two levers, both measured:

* every tile has the SAME static shape, so instead of the reference's
  one-tile-at-a-time loop (a model call per tile), all tiles are stacked
  into batched compiled forwards — the MXU sees one big batch;
* the ENTIRE pipeline after the frame upload stays on device: tile
  extraction (static slices of the uploaded frame), flip-averaging, and
  the count-normalized canvas accumulation run inside ONE jitted function,
  so a frame costs one (H, W, 3) upload and one download — the (H, W, C)
  logits canvas, or a (H, W) int32 class map with ``class_map=True``
  (what the CLI saves). The first cut of this path pulled every chunk's
  (T, th, tw, 19) float32 logits to host — ~1.4 GB/frame at Cityscapes
  geometry, which dominated end-to-end latency on any host link.
"""

from __future__ import annotations

import functools
from math import ceil
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from scipy import ndimage

from segtpu.ops.reductions import fast_argmax
from segtpu.ops.resize import resize_bilinear


def make_predictor(model, params, batch_stats,
                   bucket: int | None = None,
                   compute_dtype=None) -> Callable:
    """Jitted (cached per input shape) eval-mode forward: NHWC -> logits.

    ``bucket``: pad H/W up to the next multiple before the forward and crop
    the logits back. Real-world inference directories contain arbitrarily
    sized images; without bucketing every (scale x image size) pair triggers
    a fresh XLA compile (minutes each on TPU). Bucketing trades exact border
    behavior (zero-pad context) for a bounded compile count.

    ``compute_dtype``: cast the input (and therefore every activation —
    layers ride the input dtype, nn/layers.py) before the forward; logits
    always come back float32. ``jnp.bfloat16`` doubles MXU throughput on
    TPU at segmentation-irrelevant logit noise (argmax-stable; measured in
    scripts/bench_inference.py). Default None keeps the float32-exact path
    the numerical parity tests pin.
    """

    @jax.jit
    def _predict(x):
        if compute_dtype is not None:
            x = x.astype(compute_dtype)
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          x, train=False)
        return out["out"].astype(jnp.float32)

    if bucket is None:
        return _predict

    def predict(x):
        h, w = x.shape[1], x.shape[2]
        ph = (-h) % bucket
        pw = (-w) % bucket
        if ph or pw:
            # jnp.pad so the wrapper also works when traced inside the
            # device-resident sliding pipeline (shapes are static there).
            x = jnp.pad(jnp.asarray(x), ((0, 0), (0, ph), (0, pw), (0, 0)))
        return _predict(x)[:, :h, :w]

    return predict


def multi_scale_predict(predict_fn: Callable, image: np.ndarray,
                        scales: Sequence[float], num_classes: int,
                        flip: bool = False,
                        class_map: bool = False) -> np.ndarray:
    """``image`` is (H, W, C) normalized float32; returns (H, W, C_cls) logits
    averaged over scales (reference inference.py:61-79), or the (H, W) int32
    argmax map with ``class_map=True`` (one small download instead of the
    full canvas).

    The scipy zoom stays on host (its spline semantics are the parity
    target), but each scale's logits are upsampled and accumulated ON
    DEVICE — nothing is downloaded until the final canvas / class map.
    """
    h, w = image.shape[:2]
    total = jnp.zeros((h, w, num_classes), jnp.float32)

    for scale in scales:
        scaled = ndimage.zoom(image, (float(scale), float(scale), 1.0),
                              order=1, prefilter=False)
        logits = predict_fn(scaled[None])
        logits = resize_bilinear(logits, (h, w), align_corners=True)
        if flip:
            flipped = predict_fn(scaled[:, ::-1][None].copy())
            flipped = resize_bilinear(flipped, (h, w), align_corners=True)
            logits = 0.5 * (logits + flipped[:, :, ::-1])
        total = total + logits[0]

    total = total / len(scales)
    if class_map:
        return np.asarray(fast_argmax(total, axis=-1))
    return np.asarray(total)


def _tile_boxes(h: int, w: int, tile_divisor: float, overlap: float):
    """Reference inference.py:26-40 tile geometry (static per frame shape)."""
    tile_h, tile_w = int(h // tile_divisor), int(w // tile_divisor)
    stride = ceil(tile_h * (1 - overlap))
    num_rows = int(ceil((h - tile_h) / stride) + 1)
    num_cols = int(ceil((w - tile_w) / stride) + 1)
    boxes = []
    for row in range(num_rows):
        for col in range(num_cols):
            x0, y0 = int(col * stride), int(row * stride)
            x1, y1 = min(x0 + tile_w, w), min(y0 + tile_h, h)
            boxes.append((y0, y1, x0, x1))
    return tile_h, tile_w, tuple(boxes)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _extract_tiles(frame, boxes, tile_h, tile_w, flip):
    """Static-slice tile extraction (+ flip doubling) from the uploaded
    frame — the frame crosses the host boundary once, tiles never do."""
    tiles = []
    for (y0, y1, x0, x1) in boxes:
        tile = frame[y0:y1, x0:x1]
        pad_h, pad_w = tile_h - (y1 - y0), tile_w - (x1 - x0)
        if pad_h or pad_w:
            tile = jnp.pad(tile, ((0, pad_h), (0, pad_w), (0, 0)))
        tiles.append(tile)
    batch = jnp.stack(tiles)
    if flip:
        batch = jnp.concatenate([batch, batch[:, :, ::-1]], axis=0)
    return batch


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _accumulate_canvas(logits, boxes, h, w, flip):
    """Count-normalized canvas accumulation (static-slice adds) on device."""
    if flip:
        t = len(boxes)
        logits = 0.5 * (logits[:t] + logits[t:][:, :, ::-1])
    total = jnp.zeros((h, w, logits.shape[-1]), jnp.float32)
    count = jnp.zeros((h, w, 1), jnp.float32)
    for (y0, y1, x0, x1), lg in zip(boxes, logits):
        total = total.at[y0:y1, x0:x1].add(lg[: y1 - y0, : x1 - x0])
        count = count.at[y0:y1, x0:x1].add(1.0)
    return total / count


def sliding_predict(predict_fn: Callable, image: np.ndarray, num_classes: int,
                    flip: bool = True, tile_divisor: float = 2.5,
                    overlap: float = 1 / 3,
                    max_tile_batch: int | None = 16,
                    class_map: bool = False) -> np.ndarray:
    """Count-normalized overlapped tiling (reference inference.py:26-58).

    Device-resident end to end: one (H, W, 3) upload, then tile extraction,
    fixed-size chunked forwards, flip-averaging and the canvas accumulation
    all stay on device; the only download is the final canvas — or the
    (H, W) int32 argmax with ``class_map=True``. ``max_tile_batch`` bounds
    peak HBM (the last chunk is padded so every chunk shares one compiled
    shape; eval-mode BN is batch-independent, so chunking is exact).
    ``None`` = all tiles in one forward.
    """
    h, w = image.shape[:2]
    tile_h, tile_w, boxes = _tile_boxes(h, w, tile_divisor, overlap)
    batch = _extract_tiles(jnp.asarray(image), boxes, tile_h, tile_w,
                           bool(flip))
    mtb = max_tile_batch or len(batch)
    outs = []
    for i in range(0, len(batch), mtb):
        chunk = jax.lax.slice_in_dim(batch, i, min(i + mtb, len(batch)))
        pad = mtb - chunk.shape[0]
        if pad:
            chunk = jnp.concatenate(
                [chunk, jnp.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
        out = predict_fn(chunk)
        outs.append(out[:mtb - pad] if pad else out)
    logits = jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]
    total = _accumulate_canvas(logits, boxes, h, w, bool(flip))
    if class_map:
        return np.asarray(fast_argmax(total, axis=-1))
    return np.asarray(total)
