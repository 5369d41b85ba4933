"""Shape alignment helper with torch F.pad semantics.

The reference aligns decoder outputs to skip/identity shapes with
``F.pad(x, (dw, 0, dh, 0))`` (reference models/enet.py:115-117,
models/gcn.py:262-265), where a NEGATIVE pad crops. ``jnp.pad`` rejects
negative widths, so this helper pads at the top/left when the target is
larger and crops from the top/left when it is smaller — exactly torch's
behavior for those call sites. Shapes are static under jit, so this is pure
Python control flow at trace time.
"""

from __future__ import annotations

import jax.numpy as jnp


def pad_or_crop_tl(x: jnp.ndarray, target_h: int, target_w: int) -> jnp.ndarray:
    """Align NHWC ``x`` to (target_h, target_w) via top/left pad-or-crop."""
    dh = target_h - x.shape[1]
    dw = target_w - x.shape[2]
    if dh > 0 or dw > 0:
        x = jnp.pad(x, ((0, 0), (max(dh, 0), 0), (max(dw, 0), 0), (0, 0)))
    if dh < 0:
        x = x[:, -dh:, :, :]
    if dw < 0:
        x = x[:, :, -dw:, :]
    return x
