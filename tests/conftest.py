"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU answer to "test multi-device without a cluster"
(SURVEY.md §4): XLA's host platform is forced to expose 8 devices so the
mesh/psum/sharding paths are exercised for real, before jax is imported
anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
