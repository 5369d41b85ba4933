"""segtpu — a TPU-native semantic segmentation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
yassouali/pytorch-segmentation (reference mounted at /root/reference), designed
TPU-first:

* NHWC layout, bfloat16 compute on the MXU, static shapes for one-time XLA
  compilation.
* Data parallelism through ``jax.sharding.Mesh`` + ``jit`` sharding
  annotations; gradient/batch-norm cross-replica reductions ride ICI
  collectives inserted by the SPMD partitioner (replacing the reference's
  ``torch.nn.DataParallel`` + vendored 741-LoC SyncBN,
  reference base/base_trainer.py:31-38, utils/sync_batchnorm/).
* Interpolation / adaptive pooling expressed as small matmuls so they run on
  the MXU instead of gather units.
* Host-side numpy/OpenCV input pipeline with the exact augmentation semantics
  of reference base/base_dataset.py, double-buffered onto device.
"""

__version__ = "0.1.0"

from segtpu import losses, metrics, schedules, palette  # noqa: F401
