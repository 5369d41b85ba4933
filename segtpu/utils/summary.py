"""Model summaries: parameter counts per top-level module + total.

Equivalent of reference base/base_model.py:14-23 (trainable-parameter logging
and __str__) and utils/torchsummary.py (per-layer table). In a functional
framework the "model" is a param pytree, so the summary walks the tree.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.traverse_util as tu
import numpy as np


def count_params(params: Any) -> int:
    return int(sum(np.prod(np.shape(leaf))
                   for leaf in tu.flatten_dict(params).values()))


def summary(params: Any, batch_stats: Any = None, max_depth: int = 1) -> str:
    """Human-readable table: per-module param counts up to ``max_depth``."""
    flat = tu.flatten_dict(params)
    groups: Dict[tuple, int] = {}
    for path, leaf in flat.items():
        key = path[:max_depth]
        groups[key] = groups.get(key, 0) + int(np.prod(np.shape(leaf)))
    lines = ["-" * 52, f"{'Module':<36}{'Params':>16}", "-" * 52]
    for key in sorted(groups):
        lines.append(f"{'/'.join(key):<36}{groups[key]:>16,}")
    total = sum(groups.values())
    lines += ["-" * 52, f"{'Trainable params':<36}{total:>16,}"]
    if batch_stats:
        n_stats = count_params(batch_stats)
        lines.append(f"{'BatchNorm running stats':<36}{n_stats:>16,}")
    lines.append("-" * 52)
    return "\n".join(lines)


def describe(model, params, batch_stats=None) -> str:
    """BaseModel.__str__ analog: repr + trainable count
    (reference base/base_model.py:20-23)."""
    return (f"{type(model).__name__}\nNbr of trainable parameters: "
            f"{count_params(params):,}")
