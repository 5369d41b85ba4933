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
    flags += " --xla_force_host_platform_device_count=8"
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # XLA:CPU's in-process collective rendezvous SIGABRTs the whole pytest
    # process if a participant is >40s late — routine on this 1-core host
    # when 8 virtual devices contend. A stall should be a wait, not a crash.
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
              " --xla_cpu_collective_call_terminate_timeout_seconds=900")
os.environ["XLA_FLAGS"] = flags.strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
