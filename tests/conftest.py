"""Test config: run everything on virtual CPU devices.

This image injects the `axon` TPU platform via sitecustomize and sets
JAX_PLATFORMS=axon; `JAX_PLATFORMS=cpu` does NOT stop the plugin from
registering, and jax.devices() keeps returning the tunneled TPU. Tests
must not ride the tunnel (slow, single real chip), so we:
  * force 8 virtual host CPU devices (XLA flag, SURVEY.md §4), and
  * pin jax's default device to CPU 0.
Mesh-based tests take their devices from ``jax.devices('cpu')``.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compile cache kept in-repo (tests/.jax_test_cache, gitignored;
# populated on first run): repeated full-suite runs skip the ~2 min XLA CPU
# compiles in test_model/test_runner/test_train_e2e. The cache key covers
# jax/XLA version + HLO, so stale entries are just misses.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_test_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache_dir)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

_cpus = jax.devices("cpu")
assert len(_cpus) >= 8, f"expected 8 virtual CPU devices, got {len(_cpus)}"
jax.config.update("jax_default_device", _cpus[0])

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(8)


@pytest.fixture(scope="session")
def cpu_devices():
    return _cpus
