"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; per the project plan all sharding
tests run against ``--xla_force_host_platform_device_count=8`` on CPU (the
driver separately dry-run-compiles the multi-chip path via __graft_entry__).
Must set env vars before jax initializes.
"""

import os

# Force CPU: the ambient environment points JAX_PLATFORMS at the remote TPU
# tunnel, which would run every test op-by-op over the network. NOTE: the
# image's sitecustomize.py imports jax at interpreter startup, so jax has
# already latched the env — we must also update jax.config below.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
assert jax.default_backend() == "cpu", "tests must run on CPU"
assert jax.device_count() == 8, "tests expect the virtual 8-device CPU mesh"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
