"""Small host-side helpers (reference utils/helpers.py equivalents).

Weight initialization lives in segtpu.nn.layers (kaiming_normal_init etc.);
the bilinear-deconv kernel lives in segtpu.models.fcn. What remains here is
mask colorization and filesystem bits.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image


def dir_exists(path: str):
    if not os.path.exists(path):
        os.makedirs(path, exist_ok=True)


def colorize_mask(mask: np.ndarray, palette) -> Image.Image:
    """P-mode PNG from an integer mask (reference utils/helpers.py:36-42)."""
    palette = list(palette)
    zero_pad = 256 * 3 - len(palette)
    palette = palette + [0] * max(zero_pad, 0)
    new_mask = Image.fromarray(mask.astype(np.uint8)).convert("P")
    new_mask.putpalette(palette)
    return new_mask


def denormalize(image: np.ndarray, mean, std) -> np.ndarray:
    """Invert the loader normalization for visualization (reference
    utils/transforms.py:16-24 DeNormalize). HWC float in [0,1]."""
    return np.clip(image * np.asarray(std) + np.asarray(mean), 0.0, 1.0)
