"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding tests run on CPU with forced host device count
(SURVEY.md §4: XLA_FLAGS=--xla_force_host_platform_device_count=8).
Must be set before jax initializes.
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
    return np.random.RandomState(8)
