"""Test harness config: force an 8-device virtual CPU mesh.

Per SURVEY.md §4: multi-chip sharding is exercised on
``xla_force_host_platform_device_count=8`` CPU so CI needs no TPU; the
driver separately compile-checks the TPU path via __graft_entry__.
Must run before any jax import.
"""

import os

# The session env pins JAX_PLATFORMS=axon (the tunneled TPU chip); tests
# must run on the virtual CPU mesh. The axon plugin ignores the env var,
# so force the platform through jax.config before any backend init.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# persistent compile cache: repeat suite runs skip the big CPU compiles
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_repo, ".jax_cache_cpu"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
