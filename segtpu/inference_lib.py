"""Multi-scale / sliding-window inference.

Parity target: reference inference.py — multi_scale_predict (:61-79:
scipy zoom per scale, bilinear align_corners=True upsample, optional
flip-averaging, mean over scales) and sliding_predict (:26-58: tile =
size/2.5, overlap 1/3, count-normalized logit accumulation).

TPU-first reformulation of the sliding mode: every tile has the SAME static
shape, so instead of the reference's one-tile-at-a-time loop (a host round
trip per tile), all tiles are stacked into one batch and run in a single
compiled forward — the MXU sees one big batch, and the canvas scatter-add
happens once on host. Flip-averaging doubles the same batch rather than
re-entering the model.
"""

from __future__ import annotations

from math import ceil
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from scipy import ndimage

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
            x = np.pad(np.asarray(x), ((0, 0), (0, ph), (0, pw), (0, 0)))
        return _predict(x)[:, :h, :w]

    return predict


def multi_scale_predict(predict_fn: Callable, image: np.ndarray,
                        scales: Sequence[float], num_classes: int,
                        flip: bool = False) -> np.ndarray:
    """``image`` is (H, W, C) normalized float32; returns (H, W, C_cls) logits
    averaged over scales (reference inference.py:61-79)."""
    h, w = image.shape[:2]
    total = np.zeros((h, w, num_classes), np.float32)

    for scale in scales:
        scaled = ndimage.zoom(image, (float(scale), float(scale), 1.0),
                              order=1, prefilter=False)
        logits = predict_fn(scaled[None])
        logits = resize_bilinear(logits, (h, w), align_corners=True)
        if flip:
            flipped = predict_fn(scaled[:, ::-1][None].copy())
            flipped = resize_bilinear(flipped, (h, w), align_corners=True)
            logits = 0.5 * (logits + flipped[:, :, ::-1])
        total += np.asarray(logits[0])

    return total / len(scales)


def _chunked_forward(predict_fn: Callable, batch: np.ndarray,
                     max_tile_batch: int | None) -> np.ndarray:
    """Run ``predict_fn`` over ``batch`` in fixed-size chunks.

    A 2048x1024 Cityscapes frame at the reference tile geometry is ~32 tiles
    x2 (flip) of 819x409 — ~0.5 GB input + ~1.6 GB float32 logits if
    materialized in ONE forward. Chunking bounds peak HBM; the last chunk is
    padded up to ``max_tile_batch`` so every chunk shares one compiled shape
    (compile count stays 1). Eval-mode BN is batch-independent, so chunked
    and unchunked outputs are identical."""
    if max_tile_batch is None or len(batch) <= max_tile_batch:
        return np.asarray(predict_fn(batch))
    outs = []
    for i in range(0, len(batch), max_tile_batch):
        chunk = batch[i:i + max_tile_batch]
        pad = max_tile_batch - len(chunk)
        if pad:
            chunk = np.concatenate(
                [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
        out = np.asarray(predict_fn(chunk))
        outs.append(out[:max_tile_batch - pad] if pad else out)
    return np.concatenate(outs, axis=0)


def sliding_predict(predict_fn: Callable, image: np.ndarray, num_classes: int,
                    flip: bool = True, tile_divisor: float = 2.5,
                    overlap: float = 1 / 3,
                    max_tile_batch: int | None = 16) -> np.ndarray:
    """Count-normalized overlapped tiling (reference inference.py:26-58),
    tiles batched into ``max_tile_batch``-sized compiled forwards
    (None = all tiles in one batch)."""
    h, w = image.shape[:2]
    tile_h, tile_w = int(h // tile_divisor), int(w // tile_divisor)
    stride = ceil(tile_h * (1 - overlap))
    num_rows = int(ceil((h - tile_h) / stride) + 1)
    num_cols = int(ceil((w - tile_w) / stride) + 1)

    tiles, boxes = [], []
    for row in range(num_rows):
        for col in range(num_cols):
            x0, y0 = int(col * stride), int(row * stride)
            x1, y1 = min(x0 + tile_w, w), min(y0 + tile_h, h)
            tile = image[y0:y1, x0:x1]
            pad_h, pad_w = tile_h - tile.shape[0], tile_w - tile.shape[1]
            if pad_h or pad_w:
                tile = np.pad(tile, ((0, pad_h), (0, pad_w), (0, 0)))
            tiles.append(tile)
            boxes.append((y0, y1, x0, x1))

    batch = np.stack(tiles)  # (T, th, tw, C)
    if flip:
        batch = np.concatenate([batch, batch[:, :, ::-1]], axis=0)
    logits = _chunked_forward(predict_fn, batch, max_tile_batch)
    if flip:
        t = len(tiles)
        logits = 0.5 * (logits[:t] + logits[t:][:, :, ::-1])

    total = np.zeros((h, w, num_classes), np.float32)
    count = np.zeros((h, w, 1), np.float32)
    for (y0, y1, x0, x1), lg in zip(boxes, logits):
        total[y0:y1, x0:x1] += lg[: y1 - y0, : x1 - x0]
        count[y0:y1, x0:x1] += 1
    return total / count
