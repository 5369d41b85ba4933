"""Device mesh and sharding helpers — the communication substrate.

The reference's only cross-device traffic is DataParallel scatter/gather and
SyncBN reduce-broadcast (SURVEY.md §2.4). Here both collapse into ONE
mechanism: a ``Mesh`` with a ``data`` axis (ICI) and an optional ``model``
axis, plus sharding annotations on the jitted step. The GSPMD partitioner
inserts the gradient all-reduce and the BN-statistics all-reduce — there is
no hand-written collective in the hot path, which is exactly what lets XLA
overlap them with compute.

A ``dcn`` axis can be prepended for multislice later; everything below is
written against axis NAMES so that change is local.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(devices: Optional[Sequence] = None, model_parallel: int = 1) -> Mesh:
    """Mesh over (data, model). ``model_parallel=1`` (the default) gives pure
    DP — the reference's only strategy. A >1 model axis shards channels of
    the big backbone convs (optional capability, not parity-required)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh, spatial: bool = False) -> NamedSharding:
    """Batch-dim sharding over the data axis (NHWC batches, integer labels).

    ``spatial=True`` additionally shards the H dimension over the ``model``
    axis — GSPMD spatial partitioning. XLA inserts the halo exchanges that
    overlapping convolution windows need, which is the TPU-native analog of
    the reference's host-side spatial tiling (SURVEY.md §5.7): one logical
    image larger than a single chip's HBM trains/evals across the mesh.
    """
    if spatial:
        return NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS))
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def tp_sharding_tree(mesh: Mesh, state, min_channels: int = 256):
    """Tensor-parallel sharding tree for a TrainState.

    Conv kernels (HWIO) whose output-channel dim is >= ``min_channels`` and
    divisible by the ``model`` axis size are sharded over that axis on O;
    their optimizer momentum buffers (same shapes) shard identically;
    everything else (BN scales, biases, batch_stats, step) replicates. The
    GSPMD partitioner then computes those convs output-channel-sharded and
    inserts the all-gathers/reduce-scatters consumers need — tensor
    parallelism without touching model code, the jit-sharding analog of
    Megatron-style column parallelism for convs. Use when one chip's HBM
    can't hold the model (the zoo's models all fit, so this is an optional
    capability beyond the reference, which has no model parallelism at all).
    """
    tp = mesh.shape[MODEL_AXIS]

    def spec(leaf):
        shape = getattr(leaf, "shape", ())
        if (len(shape) == 4 and shape[-1] >= min_channels
                and shape[-1] % tp == 0):
            return NamedSharding(mesh, P(None, None, None, MODEL_AXIS))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec, state)


def shard_state(mesh: Mesh, state, tree=None):
    """device_put a TrainState onto the mesh.

    ``tree``: a sharding pytree (e.g. from :func:`tp_sharding_tree`) —
    pass the SAME tree to the step's ``state_sharding`` so the jitted
    layout matches the placed buffers (donation stays copy-free). None
    replicates."""
    if tree is None:
        tree = jax.tree_util.tree_map(
            lambda _: replicated_sharding(mesh), state)
    return jax.tree_util.tree_map(jax.device_put, state, tree)


def shard_batch(mesh: Mesh, batch, spatial: bool = False):
    """Shard a host batch (pytree of np arrays) over the ``data`` axis
    (``spatial=True`` additionally shards H over ``model`` — must match the
    step's ``batch_sharding`` or jit rejects the placed arrays).

    Single-process (one host, N local chips): a plain sharded device_put.
    Multi-process (TPU pod: one process per host, jax.distributed
    initialized): each host loads only ITS slice of the global batch — the
    per-process arrays are assembled into one global jax.Array with
    ``make_array_from_process_local_data``, no cross-host data movement.
    The loaders' deterministic seeding makes per-host disjoint loading a
    matter of slicing ``DataLoader.indices`` by process index.
    """
    sh = batch_sharding(mesh, spatial=spatial)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda a: jax.make_array_from_process_local_data(sh, np.asarray(a)),
            batch)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), batch)
