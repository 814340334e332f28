"""Test harness: run everything on a virtual 8-device CPU mesh.

The reference test suite never truly executes multi-device code (its
DistEvalHook test mocks ``multi_gpu_test``; see SURVEY.md §4). We do better:
forcing ``xla_force_host_platform_device_count=8`` makes every sharding /
collective path in the unit tests genuinely execute on 8 XLA devices.

Must set env vars before the first ``import jax`` anywhere in the test run.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env var alone does not win over an already-registered PJRT plugin
# (the 'axon' TPU tunnel); the config update does.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
