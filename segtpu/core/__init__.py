"""Core TPU runtime: device mesh, train state, jitted train/eval steps.

This layer replaces the reference's L6 parallelism runtime
(torch.nn.DataParallel + vendored SyncBN + CUDA-stream prefetcher,
reference base/base_trainer.py:31-38, utils/sync_batchnorm/,
base/base_dataloader.py:49-85) with the TPU-native formulation:
one ``jax.sharding.Mesh``, sharding-annotated ``jit``, and XLA-inserted ICI
collectives.
"""

from segtpu.core.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    shard_state,
    tp_sharding_tree,
)
from segtpu.core.state import (TrainState, create_train_state,  # noqa: F401
                               make_optimizer, make_optimizer_with_schedules)
from segtpu.core.steps import make_train_step, make_eval_step  # noqa: F401
