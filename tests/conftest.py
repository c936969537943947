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

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
