"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU answer to "test multi-device without a cluster"
(SURVEY.md §4): XLA's host platform is forced to expose 8 devices so the
mesh/psum/sharding paths are exercised for real, before jax is imported
anywhere.
"""

import os

# Hard override: the session env points JAX_PLATFORMS at the real TPU tunnel
# ("axon") and its sitecustomize re-registers the axon backend at interpreter
# start, so the env var alone is not enough — update the jax config after
# import. Tests must run on the virtual 8-device CPU mesh regardless.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
