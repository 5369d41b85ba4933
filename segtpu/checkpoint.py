"""Checkpoint / resume via orbax (reference base/base_trainer.py:138-173).

Same state contents as the reference's torch.save dict: model weights
(params + batch_stats), optimizer state, epoch, monitor_best, and the full
config (provenance — resume trusts the checkpoint's config, reference
train.py:55-57). Orbax gives atomic multi-host-safe writes, which is the
preemption-recovery story on TPU (SURVEY.md §5.3).
"""

from __future__ import annotations

import json
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
    meta = {"epoch": epoch, "monitor_best": float(monitor_best),
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


def load_pretrained_backbone(state, path: str):
    """Merge a converted backbone checkpoint (scripts/convert_weights.py)
    into a TrainState: its params/batch_stats replace the model's
    ``backbone`` scope. Replaces the reference's in-constructor pretrained
    loads (e.g. models/resnet.py:239-306). Tree structure and every leaf
    shape must match the model's backbone exactly."""
    import jax.numpy as jnp
    import numpy as np
    import orbax.checkpoint as ocp

    restored = ocp.StandardCheckpointer().restore(os.path.abspath(path))
    bb_params, bb_stats = restored["params"], restored["batch_stats"]

    def checked(old, new):
        if np.shape(old) != np.shape(new):
            raise ValueError(
                f"backbone shape mismatch: {np.shape(old)} vs {np.shape(new)}")
        return jnp.asarray(new)

    if "backbone" not in state.params:
        raise KeyError("model has no 'backbone' scope to load into")
    new_params = dict(state.params)
    new_params["backbone"] = jax.tree_util.tree_map(
        checked, new_params["backbone"], bb_params)
    new_stats = dict(state.batch_stats)
    if bb_stats and "backbone" in new_stats:
        new_stats["backbone"] = jax.tree_util.tree_map(
            checked, new_stats["backbone"], bb_stats)
    return state.replace(params=new_params, batch_stats=new_stats)


def load_config_from_checkpoint(path: str) -> Optional[Dict]:
    meta_path = os.path.join(os.path.abspath(path), _META)
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            return json.load(f).get("config")
    return None
