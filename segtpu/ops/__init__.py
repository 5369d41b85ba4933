"""TPU-native tensor ops used by the model zoo.

These replace torch/cuDNN primitives from the reference with XLA-friendly
formulations: interpolation and adaptive pooling become small matmuls (MXU),
max-unpooling becomes a one-hot expand (VPU), all with static shapes.
"""

from segtpu.ops.resize import (  # noqa: F401
    resize_bilinear,
    resize_nearest,
    linear_resize_matrix,
)
from segtpu.ops.pooling import (  # noqa: F401
    max_pool,
    avg_pool,
    adaptive_avg_pool,
    adaptive_avg_pool_multi,
    max_pool_argmax,
    max_unpool,
)
from segtpu.ops.pixelshuffle import pixel_shuffle  # noqa: F401
