"""Jitted train / eval steps with device-resident metrics.

Replaces the reference hot loop (reference trainer.py:37-107): one jit'd
function does forward + aux loss + backward + optimizer + seg-metric
accumulation. Differences by design:

* The reference syncs device->host EVERY iteration for metrics
  (reference trainer.py:72,84-85, utils/metrics.py:46,57). Here the
  (correct, labeled, inter, union) accumulators are computed inside the step
  and stay on device; the host only reads them at log boundaries.
* Batch sharded over the mesh ``data`` axis — the gradient all-reduce and BN
  statistics all-reduce are inserted by GSPMD over ICI (no DataParallel
  gather, no loss.mean() over replicas, reference trainer.py:68-69).
* Mixed precision: activations in bfloat16 on the MXU, BN statistics / loss /
  optimizer state in float32. ``donate`` on the state buffers keeps HBM flat.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from segtpu.metrics import SegStats, seg_stats_from_logits
from segtpu.core.mesh import batch_sharding, replicated_sharding


def _prep_images(images, norm_stats, compute_dtype):
    """Device-side ToTensor+Normalize for uint8-transport batches.

    With ``norm_stats=(mean, std)`` the loader ships raw uint8 pixels (4x
    less H2D than host-normalized float32) and the step applies the
    reference's transforms.Normalize(ToTensor(x)) = (x/255 - mean)/std
    (reference base/base_dataset.py:28-29,133) in float32 — the identical
    arithmetic the host path does, so the two transports produce the same
    batches bit-for-bit. XLA fuses the normalize into the first conv's
    input chain."""
    if norm_stats is not None:
        mean, std = norm_stats
        x = images.astype(jnp.float32) / 255.0
        x = (x - jnp.asarray(mean, jnp.float32)) / jnp.asarray(std, jnp.float32)
        return x.astype(compute_dtype)
    return images.astype(compute_dtype)


def make_train_step(
    model,
    loss_fn: Callable,
    num_classes: int,
    ignore_index: int = 255,
    aux_weight: float = 0.4,
    compute_dtype=jnp.bfloat16,
    mesh=None,
    remat: bool = False,
    spatial: bool = False,
    norm_stats=None,
    state_sharding=None,
):
    """Returns step(state, images, labels, rng) -> (state, loss, SegStats).

    ``spatial=True`` shards the image H dimension over the mesh ``model``
    axis in addition to batch-over-``data`` (GSPMD spatial partitioning with
    automatic halo exchange) — see segtpu.core.mesh.batch_sharding.

    ``loss_fn(logits, labels, ignore_index)`` — any of segtpu.losses.
    Aux-head models contribute ``loss + aux_weight * loss_aux``
    (reference trainer.py:57-66).

    ``remat=True`` wraps the forward in ``jax.checkpoint``: the backward pass
    recomputes activations instead of keeping them live, trading ~1/3 more
    FLOPs for roughly half the peak HBM — enables ~2x batch at 769^2 crops.
    Logits stay in ``compute_dtype`` end-to-end; the losses upcast to float32
    inside their reductions (fused by XLA), avoiding a materialized
    full-resolution float32 copy.
    """

    def step(state, images, labels, rng):
        dropout_rng = jax.random.fold_in(rng, state.step)

        def forward(params):
            return model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                _prep_images(images, norm_stats, compute_dtype),
                train=True,
                rngs={"dropout": dropout_rng},
                mutable=["batch_stats"],
            )

        if remat:
            forward = jax.checkpoint(forward)

        def compute_loss(params):
            outputs, mutated = forward(params)
            logits = outputs["out"]
            loss = loss_fn(logits, labels, ignore_index=ignore_index)
            if "aux" in outputs:
                loss = loss + aux_weight * loss_fn(outputs["aux"], labels,
                                                   ignore_index=ignore_index)
            return loss, (logits, mutated)

        (loss, (logits, mutated)), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads).replace(
            batch_stats=mutated["batch_stats"])
        stats = seg_stats_from_logits(logits, labels)
        return new_state, loss, stats

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))
    bs = batch_sharding(mesh, spatial=spatial)
    rep = replicated_sharding(mesh)
    # state_sharding: replicated by default; pass core.mesh.tp_sharding_tree
    # (and shard_state the state to match) for tensor parallelism — the new
    # state keeps the same layout, so donation stays buffer-stable.
    ssh = state_sharding if state_sharding is not None else rep
    return jax.jit(
        step,
        in_shardings=(ssh, bs, bs, rep),
        out_shardings=(ssh, rep, rep),
        donate_argnums=(0,),
    )


def make_eval_step(
    model,
    loss_fn: Callable,
    num_classes: int,
    ignore_index: int = 255,
    compute_dtype=jnp.bfloat16,
    mesh=None,
    return_logits: bool = False,
    spatial: bool = False,
    norm_stats=None,
    state_sharding=None,
):
    """Returns step(state, images, labels) -> (loss, SegStats[, logits]).

    Pass the same ``state_sharding`` tree as the train step when the state
    is TP-sharded — otherwise eval would all-gather every sharded kernel
    into each chip (the OOM tensor parallelism exists to avoid)."""

    def step(state, images, labels):
        outputs = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            _prep_images(images, norm_stats, compute_dtype),
            train=False,
        )
        logits = outputs["out"]
        loss = loss_fn(logits, labels, ignore_index=ignore_index)
        stats = seg_stats_from_logits(logits, labels)
        if return_logits:
            return loss, stats, logits
        return loss, stats

    if mesh is None:
        return jax.jit(step)
    bs = batch_sharding(mesh, spatial=spatial)
    rep = replicated_sharding(mesh)
    ssh = state_sharding if state_sharding is not None else rep
    out_sh = (rep, rep, bs) if return_logits else (rep, rep)
    return jax.jit(step, in_shardings=(ssh, bs, bs),
                   out_shardings=out_sh)
