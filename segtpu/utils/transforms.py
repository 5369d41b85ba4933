"""Paired image+mask transforms (numpy) — reference utils/transforms.py.

The main training path augments inside BaseDataset (segtpu/data/base.py);
these standalone paired transforms cover the reference's extra utilities
(Compose/RandomCrop/CenterCrop/RandomHorizontallyFlip/Scale/RandomSizedCrop/
RandomRotate/SlidingCrop, reference utils/transforms.py:50-271) for custom
pipelines, plus DeNormalize (:16-24) used by val visualization.

All transforms take and return (image HWC float32/uint8, mask HW int) numpy
arrays; randomness comes from an explicit ``random.Random`` for determinism.
"""

from __future__ import annotations

import math
import random as _random
from typing import Sequence, Tuple

import cv2
import numpy as np

Pair = Tuple[np.ndarray, np.ndarray]


class Compose:
    def __init__(self, transforms: Sequence):
        self.transforms = list(transforms)

    def __call__(self, img, mask, rng=_random):
        assert img.shape[:2] == mask.shape[:2]
        for t in self.transforms:
            img, mask = t(img, mask, rng)
        return img, mask


class DeNormalize:
    """Invert Normalize for visualization (reference utils/transforms.py:16-24)."""

    def __init__(self, mean, std):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def __call__(self, tensor_hwc: np.ndarray) -> np.ndarray:
        return tensor_hwc * self.std + self.mean


class RandomCrop:
    def __init__(self, size, padding: int = 0):
        self.size = (size, size) if isinstance(size, int) else tuple(size)
        self.padding = padding

    def __call__(self, img, mask, rng=_random) -> Pair:
        if self.padding > 0:
            p = self.padding
            img = np.pad(img, ((p, p), (p, p), (0, 0)))
            mask = np.pad(mask, ((p, p), (p, p)))
        h, w = mask.shape
        th, tw = self.size
        if w == tw and h == th:
            return img, mask
        if w < tw or h < th:
            img = cv2.resize(img, (tw, th), interpolation=cv2.INTER_LINEAR)
            mask = cv2.resize(mask.astype(np.float32), (tw, th),
                              interpolation=cv2.INTER_NEAREST).astype(mask.dtype)
            return img, mask
        x1 = rng.randint(0, w - tw)
        y1 = rng.randint(0, h - th)
        return img[y1:y1 + th, x1:x1 + tw], mask[y1:y1 + th, x1:x1 + tw]


class CenterCrop:
    def __init__(self, size):
        self.size = (size, size) if isinstance(size, int) else tuple(size)

    def __call__(self, img, mask, rng=_random) -> Pair:
        h, w = mask.shape
        th, tw = self.size
        x1 = int(round((w - tw) / 2.0))
        y1 = int(round((h - th) / 2.0))
        return img[y1:y1 + th, x1:x1 + tw], mask[y1:y1 + th, x1:x1 + tw]


class RandomHorizontallyFlip:
    def __call__(self, img, mask, rng=_random) -> Pair:
        if rng.random() < 0.5:
            return np.fliplr(img).copy(), np.fliplr(mask).copy()
        return img, mask


class Scale:
    """Resize so the LONGER side equals ``size`` (reference :133-147)."""

    def __init__(self, size: int):
        self.size = size

    def __call__(self, img, mask, rng=_random) -> Pair:
        h, w = mask.shape
        if (w >= h and w == self.size) or (h > w and h == self.size):
            return img, mask
        if w > h:
            ow = self.size
            oh = int(self.size * h / w)
        else:
            oh = self.size
            ow = int(self.size * w / h)
        img = cv2.resize(img, (ow, oh), interpolation=cv2.INTER_LINEAR)
        mask = cv2.resize(mask.astype(np.float32), (ow, oh),
                          interpolation=cv2.INTER_NEAREST).astype(mask.dtype)
        return img, mask


class RandomSizedCrop:
    """Random area (45-100%) + aspect (0.5-2) crop resized to ``size``
    (reference :149-175)."""

    def __init__(self, size: int, attempts: int = 10):
        self.size = size
        self.attempts = attempts

    def __call__(self, img, mask, rng=_random) -> Pair:
        h, w = mask.shape
        for _ in range(self.attempts):
            area = h * w
            target_area = rng.uniform(0.45, 1.0) * area
            aspect = rng.uniform(0.5, 2.0)
            cw = int(round(math.sqrt(target_area * aspect)))
            ch = int(round(math.sqrt(target_area / aspect)))
            if rng.random() < 0.5:
                cw, ch = ch, cw
            if cw <= w and ch <= h:
                x1 = rng.randint(0, w - cw)
                y1 = rng.randint(0, h - ch)
                ci = img[y1:y1 + ch, x1:x1 + cw]
                cm = mask[y1:y1 + ch, x1:x1 + cw]
                ci = cv2.resize(ci, (self.size, self.size),
                                interpolation=cv2.INTER_LINEAR)
                cm = cv2.resize(cm.astype(np.float32), (self.size, self.size),
                                interpolation=cv2.INTER_NEAREST).astype(mask.dtype)
                return ci, cm
        # fallback: scale + center crop
        img, mask = Scale(self.size)(img, mask, rng)
        return CenterCrop(self.size)(img, mask, rng)


class RandomRotate:
    def __init__(self, degree: float):
        self.degree = degree

    def __call__(self, img, mask, rng=_random) -> Pair:
        angle = rng.random() * 2 * self.degree - self.degree
        h, w = mask.shape
        rot = cv2.getRotationMatrix2D((w / 2, h / 2), angle, 1.0)
        img = cv2.warpAffine(img, rot, (w, h), flags=cv2.INTER_LINEAR)
        mask = cv2.warpAffine(mask.astype(np.float32), rot, (w, h),
                              flags=cv2.INTER_NEAREST).astype(mask.dtype)
        return img, mask


class SlidingCrop:
    """Tile an image into overlapping crop_size windows with reflect-pad of
    the remainder; returns lists of (img, mask) tiles + positions
    (reference :216-271)."""

    def __init__(self, crop_size: int, stride_rate: float, ignore_label: int):
        self.crop_size = crop_size
        self.stride_rate = stride_rate
        self.ignore_label = ignore_label

    def _pad(self, img, mask):
        h, w = mask.shape
        pad_h = max(self.crop_size - h, 0)
        pad_w = max(self.crop_size - w, 0)
        if pad_h > 0 or pad_w > 0:
            img = np.pad(img, ((0, pad_h), (0, pad_w), (0, 0)))
            mask = np.pad(mask, ((0, pad_h), (0, pad_w)),
                          constant_values=self.ignore_label)
        return img, mask, h, w

    def __call__(self, img, mask, rng=_random):
        h, w = mask.shape
        if max(h, w) > self.crop_size:
            stride = int(math.ceil(self.crop_size * self.stride_rate))
            num_h = int(math.ceil((h - self.crop_size) / stride)) + 1
            num_w = int(math.ceil((w - self.crop_size) / stride)) + 1
            imgs, masks, slices = [], [], []
            for yi in range(num_h):
                for xi in range(num_w):
                    sy = min(yi * stride, max(h - self.crop_size, 0))
                    sx = min(xi * stride, max(w - self.crop_size, 0))
                    ci = img[sy:sy + self.crop_size, sx:sx + self.crop_size]
                    cm = mask[sy:sy + self.crop_size, sx:sx + self.crop_size]
                    ci, cm, ch, cw = self._pad(ci, cm)
                    imgs.append(ci)
                    masks.append(cm)
                    slices.append((sy, sx, ch, cw))
            return imgs, masks, slices
        img, mask, ch, cw = self._pad(img, mask)
        return [img], [mask], [(0, 0, ch, cw)]
