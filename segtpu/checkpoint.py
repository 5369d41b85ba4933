"""Checkpoint / resume via orbax (reference base/base_trainer.py:138-173).

Same state contents as the reference's torch.save dict: model weights
(params + batch_stats), optimizer state, epoch, monitor_best, and the full
config (provenance — resume trusts the checkpoint's config, reference
train.py:55-57). Orbax gives atomic multi-host-safe writes, which is the
preemption-recovery story on TPU (SURVEY.md §5.3).
"""

from __future__ import annotations

import json
import math
import os
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp

_META = "meta.json"


def save_checkpoint(directory: str, name: str, state, epoch: int,
                    monitor_best: float, config: Dict, arch: str,
                    extra_meta: Optional[Dict] = None):
    """``extra_meta`` extends meta.json — used by mid-epoch (step-level)
    checkpoints to record ``resume_epoch``/``resume_iter`` (preemption
    recovery beyond the reference's epoch-granular saves, SURVEY §5.3)."""
    path = os.path.abspath(os.path.join(directory, name))
    ckptr = ocp.StandardCheckpointer()
    tree = {"params": state.params, "batch_stats": state.batch_stats,
            "opt_state": state.opt_state, "step": state.step}
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    # +/-inf means "no validation has run yet" (a min-monitor starts at
    # +inf): store None so resume keeps its own fresh init instead of a
    # bogus 0.0 that a 'min' monitor could never improve on.
    mb = float(monitor_best)
    meta = {"epoch": epoch,
            "monitor_best": mb if math.isfinite(mb) else None,
            "config": config, "arch": arch}
    if extra_meta:
        meta.update(extra_meta)
    with open(os.path.join(path, _META), "w") as f:
        json.dump(meta, f, indent=2, default=str)


def load_checkpoint(path: str, state) -> Tuple[Any, Dict]:
    """Restore into the structure of ``state``; returns (new_state, meta)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree_util.tree_map(
        ocp.utils.to_shape_dtype_struct,
        {"params": state.params, "batch_stats": state.batch_stats,
         "opt_state": state.opt_state, "step": state.step})
    restored = ckptr.restore(path, abstract)
    new_state = state.replace(params=restored["params"],
                              batch_stats=restored["batch_stats"],
                              opt_state=restored["opt_state"],
                              step=restored["step"])
    meta_path = os.path.join(path, _META)
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return new_state, meta


def load_model_weights(path: str, params, batch_stats):
    """Restore ONLY the model weights (params + batch_stats) from a full
    training checkpoint — the inference path. A full-state restore would
    require reconstructing the exact optimizer pytree the checkpoint was
    trained with (Adam vs SGD vs OneCycle's inject_hyperparams all differ
    structurally); inference doesn't need any of it."""
    path = os.path.abspath(path)
    abstract = jax.tree_util.tree_map(
        ocp.utils.to_shape_dtype_struct,
        {"params": params, "batch_stats": batch_stats})
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(
            path, args=ocp.args.PyTreeRestore(item=abstract,
                                              partial_restore=True))
    return restored["params"], restored["batch_stats"]


def load_config_from_checkpoint(path: str) -> Optional[Dict]:
    meta_path = os.path.join(os.path.abspath(path), _META)
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            return json.load(f).get("config")
    return None
